"""A2D / JHMDB evaluation entry point (reference: main.py --eval path,
engine.py:126-194).

Usage:
    python -m ocpg_tpu.cli.evaluate --dataset_file a2d --a2d_path /data/a2d \
        --checkpoint output/a2d_r101/checkpoints --backbone resnet101
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser("ocpg_tpu evaluation")
    p.add_argument("--dataset_file", default="a2d", choices=["a2d", "jhmdb"])
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--a2d_path", default=None)
    p.add_argument("--jhmdb_path", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=3)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--invert_masks", action="store_true",
                   help="replicate the reference postprocessor quirk (postprocessors.py:46)")
    p.add_argument("--readback", default="f32", choices=["f16", "f32"],
                   help="mask-logit readback wire for --postprocess host: "
                        "f32 (default) parity-grade, f16 halves the "
                        "dominant device->host bytes (E2E_EVAL_TPU.json)")
    p.add_argument("--postprocess", default="device",
                   choices=["device", "host"],
                   help="'device' (default) fuses crop/resize-to-original/"
                        "threshold/bit-pack into the jitted forward — the "
                        "mask wire becomes packed binary at native "
                        "resolution (~150x fewer bytes than the f32 "
                        "canvas) and the per-sample host resize round-trip "
                        "disappears; 'host' is the legacy numpy postprocess "
                        "over full-canvas logits (bit-exact wire)")
    p.add_argument("--canvas", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="static loader canvas (default: canvas_for())")
    p.add_argument("--config_overrides", default=None,
                   help="JSON dict of OCPGConfig field overrides (tests/tools)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..config import OCPGConfig, apply_config_overrides
    from ..data.datasets import build_dataset
    from ..data.loader import ClipLoader
    from ..engine.evaluate import evaluate_a2d
    from ..models import build_model
    from ..models.text_encoder import SimpleTokenizer

    cfg = OCPGConfig(backbone=args.backbone, dataset_file=args.dataset_file,
                     num_frames=args.num_frames)
    cfg = apply_config_overrides(cfg, args.config_overrides)
    root = args.a2d_path if args.dataset_file == "a2d" else args.jhmdb_path
    dataset = build_dataset(args.dataset_file, root, "val", cfg.num_frames)
    # batch axis shards over the device mesh in evaluate_a2d; the loader pads
    # the tail batch (real_count) so every sample is still scored
    loader = ClipLoader(dataset, args.batch_size * jax.device_count(),
                        tokenizer=SimpleTokenizer(args.tokenizer_path,
                                                  vocab_size=cfg.text_vocab),
                        train=False,
                        canvas=tuple(args.canvas) if args.canvas else None,
                        compact=True)   # uint8 wire; normalize on device

    model, *_ = build_model(cfg)
    host = next(iter(loader.epoch(0)))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(host["samples"]), jnp.asarray(host["samples_mask"]),
        jnp.asarray(host["text_ids"]), jnp.asarray(host["text_mask"]),
        jnp.asarray(host["targets"]["size"]),
        valid_indices=jnp.asarray(host.get("valid_indices", jnp.zeros(len(host["samples"]), jnp.int32))),
        train=False,
    )
    if args.checkpoint:
        import os

        if os.path.isfile(args.checkpoint):  # reference-style torch .pth
            from ..engine.checkpoint import load_pretrained_torch

            params = load_pretrained_torch(params, args.checkpoint, cfg,
                                           drop_class_heads=False)
        else:
            from ..engine.checkpoint import load_params

            params = load_params(args.checkpoint, params)

    metrics = evaluate_a2d(model, params, loader, args.dataset_file,
                           invert_masks=args.invert_masks,
                           readback=args.readback,
                           postprocess=args.postprocess)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
