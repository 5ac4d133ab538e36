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
    p.add_argument("--clip_len", type=int, default=36,
                   help="frames per chunk; 0 = WHOLE-VIDEO forwards (one "
                        "request per expression, clip_len = longest video "
                        "in the split — the reference's exact semantics, "
                        "inference_ytvos.py:198; HBM fits ~400 frames at "
                        "360p, HBM_ENVELOPE.json).  Chunked mode stays "
                        "reference-equivalent via --query_select global")
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
    p.add_argument("--query_select", default="global",
                   choices=["global", "chunk"],
                   help="'global' (default): aggregate per-query scores "
                        "across a video's chunks (frame-count-weighted mean "
                        "— exactly the whole-video mean), pick ONE query, "
                        "and re-run only the chunks whose local argmax "
                        "differed, matching the reference's whole-video "
                        "forward (inference_ytvos.py:198-213) where the "
                        "referred-object identity cannot switch mid-video; "
                        "'chunk' keeps the per-chunk argmax (round<=4 "
                        "behavior)")
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

    clip_len = args.clip_len
    if clip_len <= 0:
        # whole-video mode: one static T covering the longest video (short
        # videos ride as padding frames the model's valid-frame mean skips)
        clip_len = max(len(v["frames"]) for v in data.values())
        print(f"whole-video mode: clip_len={clip_len}", flush=True)
    args.clip_len = clip_len

    engine = None
    for video, vdata in data.items():
        frames = vdata["frames"]
        chunks = [frames[s:s + clip_len]
                  for s in range(0, len(frames), clip_len)]
        clip_cache = {}
        origin_size = None
        for ci, clip_names in enumerate(chunks):
            clip_cache[ci], origin_size = load_frames(
                img_folder, video, clip_names, args.resize, args.max_size)
        if engine is None:
            _, engine = init_engine(cfg, args, clip_cache[0], tokenizer,
                                    want_query_scores=(args.query_select == "global"))

        requests, meta = [], []
        for exp_id, ed in vdata["expressions"].items():
            exp = " ".join(ed["exp"].lower().split())
            ids, attn = tokenizer([exp])
            for ci in range(len(chunks)):
                requests.append(InferRequest(clip_cache[ci], ids[0], attn[0]))
                meta.append((exp_id, ci))
        results = engine.run(requests)
        all_refs = list(engine.last_ref_points)

        if args.query_select == "global":
            # frame-count-weighted mean of the chunk means == the whole-video
            # valid-frame mean (chunks partition the frames), so this argmax
            # IS the reference's global best-query choice; only chunks whose
            # local argmax differed are re-run, forcing the global query
            scores = engine.last_query_scores
            by_exp = {}
            for k, (exp_id, ci) in enumerate(meta):
                by_exp.setdefault(exp_id, []).append(k)
            redo = []
            for exp_id, ks in by_exp.items():
                if len(ks) <= 1:
                    continue
                tot = sum(requests[k].frames.shape[0] for k in ks)
                agg = sum(scores[k] * requests[k].frames.shape[0] for k in ks) / tot
                gq = int(agg.max(axis=-1).argmax())
                for k in ks:
                    if int(scores[k].max(axis=-1).argmax()) != gq:
                        requests[k] = InferRequest(
                            requests[k].frames, requests[k].text_ids,
                            requests[k].text_mask, query_override=gq)
                        redo.append(k)
            if redo:
                redo_results = engine.run([requests[k] for k in redo])
                for i, k in enumerate(redo):
                    results[k] = redo_results[i]
                    all_refs[k] = engine.last_ref_points[i]

        per, per_refs = {}, {}
        for k, ((exp_id, ci), m) in enumerate(zip(meta, results)):
            m = np.asarray(bilinear_resize(jnp.asarray(m[..., None]),
                                           tuple(origin_size),
                                           align_corners=False))[..., 0]
            per.setdefault(exp_id, {})[ci] = (1.0 / (1.0 + np.exp(-m))) > args.threshold
            if args.visualize:
                # reference points are normalized to the VALID (unpadded)
                # region (see infer_davis) — no canvas rescale needed
                per_refs.setdefault(exp_id, {})[ci] = all_refs[k]

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
