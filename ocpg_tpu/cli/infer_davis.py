"""Ref-DAVIS17 inference: per-annotator palette PNG masks.

Reference: /root/reference/inference_davis.py.  The reference spawns one
Python process + model replica per GPU and shards videos over them (:97-109,
131), capping clips at 36 frames because of the CUDA im2col_step (:167,
198-199).  Here every (annotator, object, chunk) clip of a video becomes one
request to `engine.infer.ClipInferenceEngine`, which batches requests across
the device mesh as ONE SPMD program with bucketed static canvases — at most
len(buckets) XLA compiles for the whole split, all chips busy.

The recipe default is `--buckets exact` — resized DAVIS val is essentially
single-shape, so exact per-request /64-aligned canvases cost one XLA compile
and carry the least padding (zero when the shape is /64-aligned); the
'serving' bucket trio remains the knob for mixed-shape request pools.

Flow per video (reference :164-271): expressions are interleaved over 4
annotators (i = obj_id * 4 + anno_id); per object the model's best-query
eval branch yields per-frame masks; per annotator the object masks are merged
by argmax with a 0.1 background and a 0.3 floor, then saved as palette PNGs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from ..data.imageio import read_rgb


def merge_annotator_masks(anno: np.ndarray) -> np.ndarray:
    """Merge one annotator's per-object score maps into a label map.

    Reference semantics (inference_davis.py:255-262): scores below the 0.3
    floor are zeroed, a constant 0.1 background plane is prepended, and each
    pixel takes the argmax — so a pixel is background unless some object
    scores >= 0.3, and ties between objects resolve to the lowest object id
    (np.argmax first-occurrence).  Labels are 0 = background, i+1 = object i.

    anno: (num_obj, T, H, W) sigmoid scores in [0, 1].  Returns (T, H, W) u8.
    """
    anno = anno.copy()
    anno[anno < 0.3] = 0.0
    bg = np.full((1,) + anno.shape[1:], 0.1, anno.dtype)
    return np.argmax(np.concatenate([bg, anno], axis=0), axis=0).astype(np.uint8)


def get_args():
    p = argparse.ArgumentParser("ocpg_tpu DAVIS inference")
    p.add_argument("--davis_path", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output_dir", default="output/davis")
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--split", default="valid")
    p.add_argument("--clip_len", type=int, default=36)
    p.add_argument("--per_device_batch", type=int, default=1,
                   help=">1 batches several clips per chip per dispatch "
                        "(higher throughput, higher per-request latency)")
    p.add_argument("--resize", type=int, default=360)
    p.add_argument("--max_size", type=int, default=640)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--buckets", default="exact",
                   help="'exact' (the default: per-request /64-aligned "
                        "canvas — minimal padding, zero only when the "
                        "resized shape is already a /64 multiple, e.g. "
                        "real 360x640 still pads to 384x640; ONE XLA "
                        "COMPILE PER DISTINCT SHAPE — multi-minute each on "
                        "TPU; fine on the fixed-resolution DAVIS/YTVOS val "
                        "splits where it is one program, and the engine "
                        "auto-falls-back to the serving trio after 4 "
                        "distinct canvases to bound compiles on mixed-"
                        "aspect pools), 'serving' (the 360p canvas bucket trio "
                        "— bounded compiles for mixed-shape request "
                        "pools; 'default' is a deprecated alias), or "
                        "'H1xW1,H2xW2,...' custom /64-multiple buckets.  "
                        "Canvas padding perturbs GroupNorm statistics and "
                        "the LFM FFT spectrum, so wider buckets trade a "
                        "small output perturbation for fewer compiles "
                        "(measured in PARITY.md)")
    p.add_argument("--visualize", action="store_true",
                   help="also save qualitative overlays (per-annotator "
                        "object-mask blends + reference-point crosses) to "
                        "<output_dir>/<split>_images.  The reference defines "
                        "the helpers (inference_davis.py:295-323) but its "
                        "loop never calls them; restored here")
    p.add_argument("--readback", default="f32", choices=["f16", "f32"],
                   help="mask-logit readback wire.  f32 (default) is the "
                        "parity-grade bit-exact wire — the right choice for "
                        "benchmark reproduction, and free on PCIe hosts.  "
                        "f16 halves device->host bytes (~2.8x faster "
                        "requests on the tunneled bench host, "
                        "SERVING_TPU.json) at <1e-3 sigmoid-score movement "
                        "— the serving knob (and the ClipInferenceEngine "
                        "API default).  Note the multi-object DAVIS merge "
                        "argmaxes across per-object scores, so f16 only "
                        "flips pixels whose object scores tie within ~1e-3")
    p.add_argument("--config_overrides", default=None,
                   help="JSON dict of OCPGConfig field overrides "
                        "(e.g. tiny models for smoke/e2e tests)")
    return p.parse_args()


def apply_overrides(cfg, args):
    from ..config import apply_config_overrides

    return apply_config_overrides(cfg, getattr(args, "config_overrides", None))


def parse_buckets(spec: str):
    """--buckets spec -> bucket tuple for ClipInferenceEngine.

    'exact' -> () (pick_bucket falls back to the per-request /64-aligned
    canvas); 'serving'/'default' -> the 360p bucket trio; otherwise a
    validated 'H1xW1,...' list — every value must be a positive multiple of
    64 or the model's integral feature-level shape assumption breaks deep
    inside XLA compilation.
    """
    from ..engine.infer import DEFAULT_BUCKETS

    if spec == "exact":
        return ()
    if spec in ("serving", "default"):
        return DEFAULT_BUCKETS
    buckets = []
    for item in spec.split(","):
        parts = item.split("x")
        if len(parts) != 2:
            raise SystemExit(
                f"--buckets: malformed bucket {item!r} (expected HxW, e.g. 384x640)")
        try:
            h, w = int(parts[0]), int(parts[1])
        except ValueError:
            raise SystemExit(f"--buckets: non-integer bucket {item!r}")
        if h <= 0 or w <= 0 or h % 64 or w % 64:
            raise SystemExit(
                f"--buckets: bucket {item!r} must be positive multiples of 64 "
                "(feature levels downsample x64; other sizes fail in XLA)")
        buckets.append((h, w))
    return tuple(buckets)


def load_frames(img_folder: Path, video: str, frame_names, resize, max_size):
    """Decode + resize to the inference scale; returns UN-normalized uint8
    RGB frames (t, h, w, 3) — the compact wire format.  ImageNet
    normalization happens on device inside the engine's jitted forward
    (4x fewer host->device bytes per clip; cv2's uint8 resize already
    rounds, so the values match the former normalize-on-host path exactly).
    """
    from ..data.transforms import _target_size
    import cv2

    imgs = []
    origin_size = None
    for name in frame_names:
        img = read_rgb(img_folder / video / f"{name}.jpg")
        if origin_size is None:
            origin_size = img.shape[:2]
        oh, ow = _target_size(img.shape[0], img.shape[1], resize, max_size)
        imgs.append(cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR))
    return np.stack(imgs), origin_size


def normalize_frames(imgs: np.ndarray) -> np.ndarray:
    """Host-side ImageNet normalization of uint8 frames — for consumers that
    need f32 input (e.g. the torch-replica parity pipeline); the engine path
    normalizes on device instead."""
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    return (imgs.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def init_engine(cfg, args, example_frames, tokenizer, want_query_scores=False):
    """Build model, init/restore params, wrap in a ClipInferenceEngine."""
    import jax
    import jax.numpy as jnp

    from ..engine.infer import ClipInferenceEngine
    from ..models import build_model

    buckets = parse_buckets(getattr(args, "buckets", "exact"))

    model, *_ = build_model(cfg)
    t, h, w = example_frames.shape[:3]
    if example_frames.dtype == np.uint8:     # compact wire: init needs f32
        example_frames = normalize_frames(example_frames)
    ids, attn = tokenizer(["init"])
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(example_frames[None]),
        jnp.zeros((1, t, h, w), bool), jnp.asarray(ids), jnp.asarray(attn),
        jnp.asarray([[h, w]], jnp.int32), train=False)
    if args.checkpoint:
        import os

        if os.path.isfile(args.checkpoint):
            # a reference-style torch .pth file: convert in place (class
            # heads kept — this is inference, not finetuning)
            from ..engine.checkpoint import load_pretrained_torch

            params = load_pretrained_torch(params, args.checkpoint, cfg,
                                           drop_class_heads=False)
        else:
            from ..engine.checkpoint import load_params

            params = load_params(args.checkpoint, params)
    import jax.numpy as _jnp

    out_dtype = (_jnp.float16 if getattr(args, "readback", "f32") == "f16"
                 else _jnp.float32)
    return model, ClipInferenceEngine(
        model, params, clip_len=args.clip_len, buckets=buckets,
        per_device_batch=getattr(args, "per_device_batch", 1),
        out_dtype=out_dtype,
        want_ref_points=getattr(args, "visualize", False),
        want_query_scores=want_query_scores)


def main():
    args = get_args()
    from PIL import Image
    import jax.numpy as jnp

    from ..config import OCPGConfig
    from ..engine.infer import InferRequest
    from ..models.text_encoder import SimpleTokenizer
    from ..ops.image import bilinear_resize

    cfg = apply_overrides(OCPGConfig(backbone=args.backbone, dataset_file="davis"), args)
    tokenizer = SimpleTokenizer(args.tokenizer_path, vocab_size=cfg.text_vocab)

    root = Path(args.davis_path)
    meta_file = root / "meta_expressions" / args.split / "meta_expressions.json"
    with open(meta_file) as f:
        data = json.load(f)["videos"]
    img_folder = root / args.split / "JPEGImages"
    save_prefix = Path(args.output_dir) / f"{args.split}"

    # palette from the first annotation PNG found
    palette = None
    ann_dir = root / args.split / "Annotations"
    for png in sorted(ann_dir.rglob("*.png")):
        palette = Image.open(png).getpalette()
        break

    engine = None
    for video, vdata in data.items():
        frames = vdata["frames"]
        expressions = vdata["expressions"]
        exp_list = list(expressions.keys())
        num_obj = len(exp_list) // 4

        # gather every (annotator, object, chunk) request of this video
        requests, meta = [], []
        origin_size = None
        chunks = [frames[s:s + args.clip_len]
                  for s in range(0, len(frames), args.clip_len)]
        clip_cache = {}
        for ci, clip_names in enumerate(chunks):
            clip_cache[ci], origin_size = load_frames(
                img_folder, video, clip_names, args.resize, args.max_size)
        for anno_id in range(4):
            for obj_id in range(num_obj):
                exp = expressions[exp_list[obj_id * 4 + anno_id]]["exp"]
                ids, attn = tokenizer([" ".join(exp.lower().split())])
                for ci in range(len(chunks)):
                    requests.append(InferRequest(clip_cache[ci], ids[0], attn[0]))
                    meta.append((anno_id, obj_id, ci))

        if engine is None:
            _, engine = init_engine(cfg, args, clip_cache[0], tokenizer)
        results = engine.run(requests)

        # reassemble: per annotator x object, concatenate chunks; resize + sigmoid
        per, per_refs = {}, {}
        for k, ((anno_id, obj_id, ci), m) in enumerate(zip(meta, results)):
            m = np.asarray(bilinear_resize(jnp.asarray(m[..., None]),
                                           tuple(origin_size),
                                           align_corners=False))[..., 0]
            per.setdefault((anno_id, obj_id), {})[ci] = 1.0 / (1.0 + np.exp(-m))
            if args.visualize:
                # reference points are normalized to the VALID (unpadded)
                # region — the model scales them by the actual sizes, not
                # the canvas (ocpg.py scale_wh; deformable_transformer
                # multiplies by valid_ratios only for sampling) — so they
                # map directly onto the original frame
                per_refs.setdefault((anno_id, obj_id), {})[ci] = (
                    engine.last_ref_points[k])                # (t, 2) xy

        origin_frames = None
        if args.visualize:
            origin_frames = [read_rgb(img_folder / video / f"{name}.jpg")
                             for name in frames]

        for anno_id in range(4):
            anno_masks = [
                np.concatenate([per[(anno_id, o)][ci] for ci in range(len(chunks))], 0)
                for o in range(num_obj)
            ]
            merged = merge_annotator_masks(np.stack(anno_masks))

            out_dir = save_prefix / f"anno_{anno_id}" / video
            out_dir.mkdir(parents=True, exist_ok=True)
            for fi in range(merged.shape[0]):
                img = Image.fromarray(merged[fi])
                if palette is not None:
                    img.putpalette(palette)
                # original frame names — the scorer looks results up by the
                # GT frame id (davis_eval reads f"{fid}.png")
                img.save(out_dir / f"{frames[fi]}.png")

            if args.visualize:
                from PIL import ImageDraw

                from ..utils.visualize import (COLORS, draw_reference_points,
                                               vis_add_mask)

                vis_dir = (Path(args.output_dir) / f"{args.split}_images"
                           / f"anno_{anno_id}" / video)
                vis_dir.mkdir(parents=True, exist_ok=True)
                obj_refs = [
                    np.concatenate([per_refs[(anno_id, o)][ci]
                                    for ci in range(len(chunks))], 0)
                    for o in range(num_obj)
                ]
                for fi in range(merged.shape[0]):
                    blend = origin_frames[fi]
                    for o in range(num_obj):
                        blend = vis_add_mask(blend, merged[fi] == o + 1,
                                             COLORS[o % len(COLORS)])
                    img = Image.fromarray(blend)
                    draw = ImageDraw.Draw(img)
                    for o in range(num_obj):
                        draw_reference_points(draw, [tuple(obj_refs[o][fi])],
                                              img.size, COLORS[o % len(COLORS)])
                    img.save(vis_dir / f"{frames[fi]}.png")
        print(f"done {video} ({len(requests)} clips, "
              f"{engine.compile_count} compiled programs)", flush=True)


if __name__ == "__main__":
    main()
