"""Ref-YouTube-VOS inference: per-expression binary PNG masks.

Reference: /root/reference/inference_ytvos.py — videos sharded over GPUs via
mp.Process (:91-127), whole video in one forward (:192-213), per-expression
binary masks saved as PNGs for server-side J&F scoring (:230-241).  (The
reference call-site passes a stale 4th arg to OCPG.forward,
inference_ytvos.py:213 — fixed by construction here.)

Here each (expression, chunk) is one request to the mesh-sharded
ClipInferenceEngine: static canvas buckets + fixed chunk length mean the full
split compiles at most len(buckets) programs; chunking is a memory knob, not
a correctness cap.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_args():
    p = argparse.ArgumentParser("ocpg_tpu YTVOS inference")
    p.add_argument("--ytvos_path", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output_dir", default="output/ytvos")
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--split", default="valid")
    p.add_argument("--clip_len", type=int, default=36)
    p.add_argument("--per_device_batch", type=int, default=1,
                   help=">1 batches several clips per chip per dispatch")
    p.add_argument("--resize", type=int, default=360)
    p.add_argument("--max_size", type=int, default=640)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--buckets", default="exact",
                   help="'exact' (default), 'serving', or 'H1xW1,...' — "
                        "see infer_davis")
    p.add_argument("--visualize", action="store_true",
                   help="also save qualitative overlays (mask blend + "
                        "reference-point cross) to <output_dir>/<split>_images "
                        "(reference inference_ytvos.py:68-71; the snapshot "
                        "defines but never calls the helpers — restored here)")
    p.add_argument("--readback", default="f32", choices=["f16", "f32"],
                   help="mask-logit readback wire: f32 (default) "
                        "parity-grade, f16 the serving knob — see infer_davis")
    p.add_argument("--config_overrides", default=None,
                   help="JSON dict of OCPGConfig field overrides")
    return p.parse_args()


def main():
    args = get_args()
    from PIL import Image
    import jax.numpy as jnp

    from ..config import OCPGConfig
    from ..data.imageio import read_rgb
    from ..engine.infer import InferRequest
    from ..models.text_encoder import SimpleTokenizer
    from ..ops.image import bilinear_resize
    from .infer_davis import apply_overrides, init_engine, load_frames

    cfg = apply_overrides(OCPGConfig(backbone=args.backbone, dataset_file="ytvos"), args)
    tokenizer = SimpleTokenizer(args.tokenizer_path, vocab_size=cfg.text_vocab)

    root = Path(args.ytvos_path)
    with open(root / "meta_expressions" / args.split / "meta_expressions.json") as f:
        data = json.load(f)["videos"]
    img_folder = root / args.split / "JPEGImages"
    save_prefix = Path(args.output_dir) / "Annotations"

    engine = None
    for video, vdata in data.items():
        frames = vdata["frames"]
        chunks = [frames[s:s + args.clip_len]
                  for s in range(0, len(frames), args.clip_len)]
        clip_cache = {}
        origin_size = None
        for ci, clip_names in enumerate(chunks):
            clip_cache[ci], origin_size = load_frames(
                img_folder, video, clip_names, args.resize, args.max_size)
        if engine is None:
            _, engine = init_engine(cfg, args, clip_cache[0], tokenizer)

        requests, meta = [], []
        for exp_id, ed in vdata["expressions"].items():
            exp = " ".join(ed["exp"].lower().split())
            ids, attn = tokenizer([exp])
            for ci in range(len(chunks)):
                requests.append(InferRequest(clip_cache[ci], ids[0], attn[0]))
                meta.append((exp_id, ci))
        results = engine.run(requests)

        per, per_refs = {}, {}
        for k, ((exp_id, ci), m) in enumerate(zip(meta, results)):
            m = np.asarray(bilinear_resize(jnp.asarray(m[..., None]),
                                           tuple(origin_size),
                                           align_corners=False))[..., 0]
            per.setdefault(exp_id, {})[ci] = (1.0 / (1.0 + np.exp(-m))) > args.threshold
            if args.visualize:
                # reference points are normalized to the VALID (unpadded)
                # region (see infer_davis) — no canvas rescale needed
                per_refs.setdefault(exp_id, {})[ci] = engine.last_ref_points[k]

        for exp_id, by_chunk in per.items():
            video_masks = np.concatenate(
                [by_chunk[ci] for ci in range(len(chunks))], 0).astype(np.uint8) * 255
            out_dir = save_prefix / video / exp_id
            out_dir.mkdir(parents=True, exist_ok=True)
            for name, frame_mask in zip(frames, video_masks):
                Image.fromarray(frame_mask).save(out_dir / f"{name}.png")

        if args.visualize:
            from ..utils.visualize import COLORS, save_overlay

            origin_frames = {name: read_rgb(img_folder / video / f"{name}.jpg")
                             for name in frames}
            for ei, (exp_id, by_chunk) in enumerate(per.items()):
                masks = np.concatenate(
                    [by_chunk[ci] for ci in range(len(chunks))], 0)
                refs = np.concatenate(
                    [per_refs[exp_id][ci] for ci in range(len(chunks))], 0)
                vis_dir = Path(args.output_dir) / f"{args.split}_images" / video / exp_id
                vis_dir.mkdir(parents=True, exist_ok=True)
                color = COLORS[ei % len(COLORS)]
                for fi, name in enumerate(frames):
                    save_overlay(vis_dir / f"{name}.png", origin_frames[name],
                                 masks[fi], color, tuple(refs[fi]))
        print(f"done {video} ({len(requests)} clips, "
              f"{engine.compile_count} compiled programs)", flush=True)


if __name__ == "__main__":
    main()
