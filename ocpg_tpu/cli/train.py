"""Training entry point (reference: /root/reference/main.py).

One SPMD program over a data-parallel mesh replaces torchrun+DDP; the
per-epoch flow mirrors main.py:197-253 (dataset iteration, train_one_epoch,
checkpoint save, JSONL stats).

Usage:
    python -m ocpg_tpu.cli.train --dataset_file a2d --backbone resnet101 \
        --a2d_path /data/a2d --output_dir output/a2d_r101 --supervision box
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def get_args():
    p = argparse.ArgumentParser("ocpg_tpu training")
    p.add_argument("--dataset_file", default="ytvos",
                   choices=["ytvos", "a2d", "davis"])
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--supervision", default="box", choices=["full", "box", "point"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_frames", type=int, default=3)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--ytvos_path", default=None)
    p.add_argument("--a2d_path", default=None)
    p.add_argument("--davis_path", default=None)
    p.add_argument("--pretrained_weights", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of steps 10-14")
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from ..config import OCPGConfig
    from ..data.datasets import build_dataset
    from ..data.loader import ClipLoader
    from ..engine import build_optimizer, create_train_state, make_train_step
    from ..engine.checkpoint import CheckpointManager, restore_params_into
    from ..models import build_model
    from ..models.text_encoder import SimpleTokenizer
    from ..parallel import create_mesh, replicate, shard_batch
    from ..utils.logging import JSONLLogger, MetricMeter

    cfg = OCPGConfig(
        backbone=args.backbone, dataset_file=args.dataset_file,
        supervision=args.supervision, num_frames=args.num_frames,
        lr=args.lr, batch_size=args.batch_size, seed=args.seed,
    )
    if args.epochs:
        cfg = cfg.replace(epochs=args.epochs)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "configs").write_text(str(cfg))  # config snapshot (main.py:38-39)

    root = {"ytvos": args.ytvos_path, "a2d": args.a2d_path, "davis": args.davis_path}[
        args.dataset_file]
    dataset = build_dataset(args.dataset_file, root, "train", cfg.num_frames,
                            cfg.supervision)
    tokenizer = SimpleTokenizer(args.tokenizer_path)
    loader = ClipLoader(dataset, cfg.batch_size * jax.device_count(),
                        tokenizer=tokenizer, train=True, seed=cfg.seed,
                        num_workers=args.num_workers)

    model, _, criterion_cfg, weight_dict = build_model(cfg)

    # init on a host batch
    host = next(iter(loader.epoch(0)))
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(host["samples"]), jnp.asarray(host["samples_mask"]),
        jnp.asarray(host["text_ids"]), jnp.asarray(host["text_mask"]),
        jnp.asarray(host["targets"]["size"]),
        targets={k: jnp.asarray(v) for k, v in host["targets"].items()},
        valid_indices=jnp.asarray(host["valid_indices"]) if "valid_indices" in host else None,
        train=True,
    )

    if args.pretrained_weights:
        from ..utils.torch_weights import load_torch_file

        src = load_torch_file(args.pretrained_weights)
        params = dict(params)
        params["params"] = restore_params_into(params["params"], src)

    steps_per_epoch = max(len(dataset) // (cfg.batch_size * jax.device_count()), 1)
    # linear LR scaling by device count (main.py:266-276)
    lr_scale = max(jax.device_count() / 4.0, 1.0)
    optimizer = build_optimizer(cfg, [e * steps_per_epoch for e in cfg.lr_drop], lr_scale)
    state = create_train_state(params, optimizer, cfg.seed)

    ckpt = CheckpointManager(str(out_dir / "checkpoints"))
    start_epoch = 0
    if args.resume:
        state = CheckpointManager(args.resume).restore(state)
        start_epoch = int(state.step) // steps_per_epoch

    mesh = create_mesh()
    state = replicate(mesh, state)
    train_step = jax.jit(
        make_train_step(model, criterion_cfg, weight_dict, optimizer,
                        has_valid_indices="valid_indices" in host),
        donate_argnums=(0,),
    )

    from ..utils.profiling import StepTimer, trace

    logger = JSONLLogger(out_dir / "log.txt")
    for epoch in range(start_epoch, cfg.epochs):
        meter = MetricMeter()
        timer = StepTimer()
        t0 = time.time()
        for i, batch in enumerate(loader.epoch(epoch)):
            timer.data_ready()
            if args.profile_dir and epoch == start_epoch and i == 10:
                import jax.profiler

                jax.profiler.start_trace(args.profile_dir)
            batch = shard_batch(mesh, batch)
            state, metrics = train_step(state, batch)
            if args.profile_dir and epoch == start_epoch and i == 14:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                import jax.profiler

                jax.profiler.stop_trace()
            timer.step_done()
            if i % args.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()
                        if k in ("loss", "grad_norm", "loss_ce", "loss_mask",
                                 "loss_proj", "loss_lst", "loss_bbox", "loss_giou")}
                meter.update(vals)
                print(f"epoch {epoch} it {i}/{steps_per_epoch} " +
                      " ".join(f"{k}={v:.4f}" for k, v in vals.items()), flush=True)
        ckpt.save(int(jax.device_get(state.step)), jax.device_get(state))
        logger.write({"epoch": epoch, "time_s": time.time() - t0,
                      **timer.averages(), **meter.averages()})
    print("done")


if __name__ == "__main__":
    main()
