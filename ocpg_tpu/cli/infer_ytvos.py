"""Ref-YouTube-VOS inference: per-expression binary PNG masks.

Reference: /root/reference/inference_ytvos.py — whole video in one forward
(:192-213), per-expression binary masks saved as PNGs for server-side J&F
scoring (:230-241).  (Note: the reference call-site passes a stale 4th arg to
OCPG.forward, inference_ytvos.py:213 — fixed by construction here.)

Chunked forward keeps static shapes; chunks are a memory knob, not a
correctness cap.
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
    p.add_argument("--resize", type=int, default=360)
    p.add_argument("--max_size", type=int, default=640)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--tokenizer_path", default=None)
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..config import OCPGConfig
    from ..models import build_model
    from ..models.text_encoder import SimpleTokenizer
    from ..ops.image import bilinear_resize
    from .infer_davis import load_frames

    cfg = OCPGConfig(backbone=args.backbone, dataset_file="ytvos")
    model, *_ = build_model(cfg)
    tokenizer = SimpleTokenizer(args.tokenizer_path)

    root = Path(args.ytvos_path)
    with open(root / "meta_expressions" / args.split / "meta_expressions.json") as f:
        data = json.load(f)["videos"]
    img_folder = root / args.split / "JPEGImages"
    save_prefix = Path(args.output_dir) / "Annotations"

    params = None

    @jax.jit
    def forward(params, samples, samples_mask, ids, attn, sizes):
        return model.apply(params, samples, samples_mask, ids, attn, sizes,
                           train=False)["pred_masks"]

    for video, vdata in data.items():
        frames = vdata["frames"]
        for exp_id, ed in vdata["expressions"].items():
            exp = " ".join(ed["exp"].lower().split())
            all_masks = []
            for start in range(0, len(frames), args.clip_len):
                clip_names = frames[start:start + args.clip_len]
                imgs, origin_size = load_frames(img_folder, video, clip_names,
                                                args.resize, args.max_size)
                t, h, w = imgs.shape[:3]
                ids, attn = tokenizer([exp])
                if params is None:
                    params = model.init(
                        jax.random.PRNGKey(0), jnp.asarray(imgs[None]),
                        jnp.zeros((1, t, h, w), bool), jnp.asarray(ids),
                        jnp.asarray(attn), jnp.asarray([[h, w]], jnp.int32),
                        train=False)
                    if args.checkpoint:
                        from ..engine.checkpoint import load_params

                        params = load_params(args.checkpoint, params)
                masks = forward(params, jnp.asarray(imgs[None]),
                                jnp.zeros((1, t, h, w), bool), jnp.asarray(ids),
                                jnp.asarray(attn), jnp.asarray([[h, w]], jnp.int32))
                m = np.asarray(masks)[0, :, 0]
                m = np.asarray(bilinear_resize(jnp.asarray(m[..., None]),
                                               tuple(origin_size),
                                               align_corners=False))[..., 0]
                all_masks.append((1.0 / (1.0 + np.exp(-m))) > args.threshold)
            video_masks = np.concatenate(all_masks, axis=0).astype(np.uint8) * 255

            out_dir = save_prefix / video / exp_id
            out_dir.mkdir(parents=True, exist_ok=True)
            for name, frame_mask in zip(frames, video_masks):
                Image.fromarray(frame_mask).save(out_dir / f"{name}.png")
        print(f"done {video}", flush=True)


if __name__ == "__main__":
    main()
