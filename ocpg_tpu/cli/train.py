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
import time
from pathlib import Path

import numpy as np


def get_args():
    p = argparse.ArgumentParser("ocpg_tpu training")
    p.add_argument("--dataset_file", default="ytvos",
                   choices=["ytvos", "a2d", "davis",
                            "joint", "joint_coco", "ytvos_joint_davis"])
    p.add_argument("--backbone", default="resnet101")
    p.add_argument("--supervision", default="box", choices=["full", "box", "point"])
    p.add_argument("--supervision_type", default="boxsup",
                   choices=["boxsup", "boxinst", "boxlevelset", "boxvos",
                            "partialsup"],
                   help="loss-suite variant.  The reference scripts pass "
                        "this flag but it does not exist in opts.py (the "
                        "boxinst/boxlevelset/boxvos recipes die in argparse "
                        "upstream; the pairwise machinery is dead code, "
                        "segmentation.py:358-500).  Here boxinst/boxvos "
                        "additionally enable the BoxInst pairwise "
                        "color-similarity losses (models/pairwise.py); "
                        "boxsup/boxlevelset keep the default suite (the "
                        "level-set loss is already always on, as upstream)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_frames", type=int, default=3)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--ytvos_path", default=None)
    p.add_argument("--a2d_path", default=None)
    p.add_argument("--davis_path", default=None)
    p.add_argument("--coco_path", default=None,
                   help="COCO root for the joint refcoco-seq datasets")
    p.add_argument("--refexp_ann_dir", default=None,
                   help="dir of COCO-format referring JSONs for joint training")
    p.add_argument("--pretrained_weights", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--num_workers", type=int, default=None,
                   help="loader decode threads; default = min(4, host cores)")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of steps 10-14")
    # model / recipe flags (reference opts.py:33-111)
    p.add_argument("--dilation", action="store_true", help="DC5 backbone")
    p.add_argument("--unfreeze_text_encoder", action="store_true",
                   help="train the text encoder (reference default freezes it)")
    p.add_argument("--freeze_video_encoder", action="store_true")
    p.add_argument("--use_checkpoint", action="store_true",
                   help="gradient rematerialisation in swin blocks")
    p.add_argument("--lr_backbone", type=float, default=None)
    p.add_argument("--lr_text_encoder", type=float, default=None)
    p.add_argument("--lr_linear_proj_mult", type=float, default=None)
    p.add_argument("--lr_drop", type=int, nargs="+", default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--clip_max_norm", type=float, default=None)
    p.add_argument("--num_feature_levels", type=int, default=None)
    p.add_argument("--num_queries", type=int, default=None)
    p.add_argument("--enc_layers", type=int, default=None)
    p.add_argument("--dec_layers", type=int, default=None)
    p.add_argument("--compute_dtype", default=None,
                   choices=["bfloat16", "float32"])
    p.add_argument("--msda_impl", default=None,
                   choices=["auto", "pallas", "separable", "xla"])
    p.add_argument("--prng_impl", default=None, choices=["rbg", "threefry"],
                   help="dropout PRNG; rbg is ~10 ms/step faster (PROFILE.md)")
    # observability (reference util/logger.py, engine.py:63-77)
    p.add_argument("--tb_every", type=int, default=200)
    p.add_argument("--debug_images_every", type=int, default=0,
                   help=">0: dump pred/target/weak map PNGs every N iters")
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
    from ..data.datasets import build_dataset
    from ..data.loader import ClipLoader
    from ..engine import build_optimizer, create_train_state, make_train_step
    from ..engine.checkpoint import CheckpointManager
    from ..models import build_model
    from ..models.text_encoder import SimpleTokenizer
    from ..parallel import create_mesh, prefetch_to_mesh, replicate, shard_batch
    from ..utils.logging import JSONLLogger, MetricMeter

    from ..parallel import initialize_distributed, is_main_process

    initialize_distributed()   # multi-host DCN when OCPG_* env is set

    cfg = OCPGConfig(
        backbone=args.backbone, dataset_file=args.dataset_file,
        supervision=args.supervision, num_frames=args.num_frames,
        lr=args.lr, batch_size=args.batch_size, seed=args.seed,
        dilation=args.dilation,
        freeze_text_encoder=not args.unfreeze_text_encoder,
        freeze_video_encoder=args.freeze_video_encoder,
        use_checkpoint=args.use_checkpoint,
        pairwise_loss=args.supervision_type in ("boxinst", "boxvos"),
    )
    if args.epochs:
        cfg = cfg.replace(epochs=args.epochs)
    for flag in ("lr_backbone", "lr_text_encoder", "lr_linear_proj_mult",
                 "weight_decay", "clip_max_norm", "num_feature_levels",
                 "num_queries", "enc_layers", "dec_layers", "compute_dtype",
                 "msda_impl", "prng_impl"):
        v = getattr(args, flag)
        if v is not None:
            cfg = cfg.replace(**{flag: v})
    if args.lr_drop is not None:
        cfg = cfg.replace(lr_drop=tuple(args.lr_drop))
    cfg = apply_config_overrides(cfg, args.config_overrides)
    # dropout PRNG: 'rbg' lowers to XLA RngBitGenerator — the big dropout
    # masks cost ~10 ms/step less than threefry at train shapes (PROFILE.md)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "configs").write_text(str(cfg))  # config snapshot (main.py:38-39)

    root = {"ytvos": args.ytvos_path, "a2d": args.a2d_path, "davis": args.davis_path,
            "joint": args.ytvos_path, "joint_coco": args.coco_path,
            "ytvos_joint_davis": args.ytvos_path}[args.dataset_file]
    dataset = build_dataset(args.dataset_file, root, "train", cfg.num_frames,
                            cfg.supervision, coco_path=args.coco_path,
                            coco_ann_dir=args.refexp_ann_dir,
                            davis_path=args.davis_path)
    tokenizer = SimpleTokenizer(args.tokenizer_path, vocab_size=cfg.text_vocab)
    loader = ClipLoader(dataset, cfg.batch_size * jax.device_count(),
                        tokenizer=tokenizer, train=True, seed=cfg.seed,
                        canvas=tuple(args.canvas) if args.canvas else None,
                        num_workers=args.num_workers,
                        # compact wire format: uint8 frames + f16 heatmaps,
                        # normalization on device (loader.decompress_batch)
                        compact=True)

    model, _, criterion_cfg, weight_dict = build_model(cfg)

    # init on a host batch (decompressed from the compact wire format)
    from ..data.loader import decompress_batch

    host_raw = next(iter(loader.epoch(0)))
    host = dict(host_raw)
    host.update(jax.device_get(decompress_batch(host_raw)))
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
        from ..engine.checkpoint import load_pretrained_torch

        params = load_pretrained_torch(params, args.pretrained_weights, cfg)

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
                        has_valid_indices="valid_indices" in host,
                        debug_images=args.debug_images_every > 0),
        donate_argnums=(0,),
    )

    from ..utils.logging import TensorBoardLogger
    from ..utils.profiling import StepTimer, trace

    logger = JSONLLogger(out_dir / "log.txt")
    tb = TensorBoardLogger(out_dir / "tb") if is_main_process() else TensorBoardLogger(None)
    debug_dir = out_dir / "debug_images"

    def dump_debug_images(step_no, pred, batch):
        """pred/target/weak map PNGs (reference engine.py:63-77)."""
        import cv2

        debug_dir.mkdir(parents=True, exist_ok=True)
        tgt = np.asarray(batch["targets"]["masks"])[0, 0]
        weak = np.asarray(batch["targets"]["weak_masks"])[0, 0]
        for name, m in (("pred", np.asarray(pred)), ("target", tgt), ("weak", weak)):
            cv2.imwrite(str(debug_dir / f"{step_no:07d}_{name}.png"),
                        (np.clip(m, 0, 1) * 255).astype(np.uint8))

    # host-side step counter: fetching state.step with device_get every
    # iteration would block the host on step completion (a tunnel round-trip
    # per step on the axon platform) and forfeit the async-dispatch overlap
    # between device compute and the next batch's decode
    step_no = int(jax.device_get(state.step))
    for epoch in range(start_epoch, cfg.epochs):
        meter = MetricMeter()
        timer = StepTimer()
        t0 = time.time()
        # double-buffered device prefetch: batch k+1's H2D transfer is issued
        # while step k executes (see parallel/mesh.py::prefetch_to_mesh)
        for i, (batch, sharded) in enumerate(
                prefetch_to_mesh(loader.epoch(epoch), mesh)):
            timer.data_ready()
            if args.profile_dir and epoch == start_epoch and i == 10:
                import jax.profiler

                jax.profiler.start_trace(args.profile_dir)
            state, metrics = train_step(state, sharded)
            if args.profile_dir and epoch == start_epoch and i == 14:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                import jax.profiler

                jax.profiler.stop_trace()
            # under async dispatch step_done() times dispatch, not device
            # execution; real step time shows up as data_wait once the loader
            # outruns the device, and epoch throughput is time_s below.
            # scripts/bench_train.py measures true device step time.
            timer.step_done()
            step_no += 1
            if i % args.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()
                        if k in ("loss", "grad_norm", "loss_ce", "loss_mask",
                                 "loss_proj", "loss_lst", "loss_bbox", "loss_giou")}
                meter.update(vals)
                print(f"epoch {epoch} it {i}/{steps_per_epoch} " +
                      " ".join(f"{k}={v:.4f}" for k, v in vals.items()), flush=True)
            if args.tb_every and i % args.tb_every == 0:
                tb.scalars(step_no, {k: float(v) for k, v in metrics.items()
                                     if np.ndim(v) == 0})
            if args.debug_images_every and i % args.debug_images_every == 0 \
                    and is_main_process():
                dump_debug_images(step_no, metrics["debug_pred"], batch)
        if is_main_process():
            ckpt.save(int(jax.device_get(state.step)), jax.device_get(state))
        logger.write({"epoch": epoch, "time_s": time.time() - t0,
                      **timer.averages(), **meter.averages()})
    ckpt.wait()  # commit the final epoch's async save before exit
    print("done")


if __name__ == "__main__":
    main()
