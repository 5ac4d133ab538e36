"""RefCOCO/+/g pretraining entry point (reference: main_pretrain.py).

Same skeleton as cli.train with image (T=1) or pseudo-video clips from the
refexp datasets, and per-dataset referring-detection evaluation
(main_pretrain.py:111-170).

Usage:
    python -m ocpg_tpu.cli.pretrain --dataset_file refcoco --coco_path /data/coco \
        --refexp_ann refcoco_train.json --output_dir output/pretrain
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def get_args():
    p = argparse.ArgumentParser("ocpg_tpu pretraining")
    p.add_argument("--dataset_file", default="refcoco",
                   choices=["refcoco", "refcoco+", "refcocog", "all"])
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--coco_path", required=True)
    p.add_argument("--refexp_ann_dir", default=None,
                   help="dir of COCO-format referring JSONs (see tools/convert_refexp)")
    p.add_argument("--as_sequence", action="store_true",
                   help="augment images into pseudo-video clips (refexp2seq)")
    p.add_argument("--num_frames", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--output_dir", default="output/pretrain")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--no_eval", action="store_true",
                   help="skip the per-epoch refcoco val evaluation")
    p.add_argument("--eval_batch_size", type=int, default=2)
    p.add_argument("--canvas", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="static loader canvas (default: canvas_for())")
    p.add_argument("--config_overrides", default=None,
                   help="JSON dict of OCPGConfig field overrides (tests/tools)")
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from ..config import OCPGConfig, apply_config_overrides
    from ..data.loader import ClipLoader
    from ..data.refexp import ConcatClipDataset, RefExpDataset
    from ..engine import build_optimizer, create_train_state, make_train_step
    from ..engine.checkpoint import CheckpointManager
    from ..models import build_model
    from ..models.text_encoder import SimpleTokenizer
    from ..parallel import create_mesh, replicate, shard_batch
    from ..utils.logging import JSONLLogger, MetricMeter

    cfg = OCPGConfig(backbone=args.backbone, dataset_file=args.dataset_file,
                     supervision="full", num_frames=args.num_frames, lr=args.lr,
                     batch_size=args.batch_size, epochs=args.epochs, seed=args.seed)
    cfg = apply_config_overrides(cfg, args.config_overrides)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)

    ann_dir = Path(args.refexp_ann_dir or args.coco_path)
    names = ["refcoco", "refcoco+", "refcocog"] if args.dataset_file == "all" else [args.dataset_file]
    datasets = [
        RefExpDataset(Path(args.coco_path) / "train2014",
                      ann_dir / f"instances_{n}_train.json",
                      num_frames=args.num_frames, as_sequence=args.as_sequence)
        for n in names
    ]
    dataset = datasets[0] if len(datasets) == 1 else ConcatClipDataset(datasets)

    # per-dataset val tuples, as main_pretrain.py:138-170
    val_loaders = []
    if not args.no_eval:
        for n in names:
            val_ann = ann_dir / f"instances_{n}_val.json"
            if val_ann.exists():
                val_loaders.append((n, RefExpDataset(
                    Path(args.coco_path) / "train2014", val_ann, num_frames=1)))

    tokenizer = SimpleTokenizer(args.tokenizer_path, vocab_size=cfg.text_vocab)
    canvas = tuple(args.canvas) if args.canvas else None
    loader = ClipLoader(dataset, cfg.batch_size * jax.device_count(),
                        tokenizer=tokenizer, train=True, seed=cfg.seed,
                        canvas=canvas, compact=True)

    model, _, criterion_cfg, weight_dict = build_model(cfg)
    from ..data.loader import decompress_batch

    host = jax.device_get(decompress_batch(next(iter(loader.epoch(0)))))
    params = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(host["samples"]), jnp.asarray(host["samples_mask"]),
        jnp.asarray(host["text_ids"]), jnp.asarray(host["text_mask"]),
        jnp.asarray(host["targets"]["size"]),
        targets={k: jnp.asarray(v) for k, v in host["targets"].items()},
        train=True,
    )
    steps_per_epoch = max(len(dataset) // (cfg.batch_size * jax.device_count()), 1)
    optimizer = build_optimizer(cfg, [e * steps_per_epoch for e in cfg.lr_drop])
    state = create_train_state(params, optimizer, cfg.seed)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = CheckpointManager(str(out_dir / "checkpoints"))
    mesh = create_mesh()
    state = replicate(mesh, state)
    train_step = jax.jit(make_train_step(model, criterion_cfg, weight_dict, optimizer),
                         donate_argnums=(0,))

    from ..engine.evaluate import evaluate_refexp_loop
    from ..utils.logging import TensorBoardLogger

    logger = JSONLLogger(out_dir / "log.txt")
    tb = TensorBoardLogger(out_dir / "tb")
    eval_cfg = cfg.replace(dataset_file="refcoco")  # eval branch selection
    eval_model, *_ = build_model(eval_cfg)
    for epoch in range(cfg.epochs):
        meter = MetricMeter()
        t0 = time.time()
        for i, batch in enumerate(loader.epoch(epoch)):
            state, metrics = train_step(state, shard_batch(mesh, batch))
            if i % 50 == 0:
                vals = {k: float(v) for k, v in metrics.items() if k == "loss"}
                meter.update(vals)
                tb.scalars(int(jax.device_get(state.step)), vals)
                print(f"epoch {epoch} it {i}/{steps_per_epoch} loss={vals['loss']:.4f}",
                      flush=True)
        ckpt.save(int(jax.device_get(state.step)), jax.device_get(state))
        record = {"epoch": epoch, "time_s": time.time() - t0, **meter.averages()}
        # per-epoch refcoco val (main_pretrain.py:138-170 / engine.py:197-300)
        params_now = jax.device_get(state.params)
        for n, val_ds in val_loaders:
            # evaluate_refexp_loop shards the batch over the full device mesh:
            # scale by device_count (as cli/evaluate.py does) so device_put
            # with P('data') divides evenly; tail padding keeps shapes static.
            val_loader = ClipLoader(val_ds, args.eval_batch_size * jax.device_count(),
                                    tokenizer=tokenizer, train=False,
                                    seed=cfg.seed, canvas=canvas, compact=True)
            stats = evaluate_refexp_loop(eval_model, params_now, val_loader)
            record.update({f"{n}_{k}": v for k, v in stats.items()})
            tb.scalars(int(jax.device_get(state.step)),
                       {f"{n}/{k}": v for k, v in stats.items()})
            print(f"epoch {epoch} [{n}] " +
                  " ".join(f"{k}={v:.4f}" for k, v in stats.items()), flush=True)
        logger.write(record)
    ckpt.wait()  # commit the final epoch's async save before exit


if __name__ == "__main__":
    main()
