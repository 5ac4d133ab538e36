"""Long loader-fed on-chip training run with mid-run checkpoint/resume proof.

VERDICT r3 next #7: extend the 400-step resident-batch overfit
(TRAIN_TPU.json) to a ~2k-step run fed by the REAL ClipLoader from a
synthetic on-disk Ref-YTVOS tree, with (a) a mid-run orbax checkpoint save,
(b) a resume-bit-exactness check — the restored TrainState replayed over the
same batches must reproduce the live run's losses bit-for-bit (state.rng is
part of the checkpointed state, so dropout replays too), and (c) a loss +
synthetic-val J&F curve.  Exercises train + checkpoint + eval as one product
(reference: /root/reference/main.py:197-239).  Writes TRAIN_LONG_TPU.json.

Usage: python scripts/train_long_run.py [--steps 2000]
"""

import argparse
import itertools
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


_VAL_FWD = {}


def synthetic_val_jf(model, params, batches):
    """Mean J (mask IoU) and boundary F of the eval branch vs the tree's GT
    masks on held-out val batches.  Uses the official DAVIS J/F metric
    implementations (evaluation/davis_metrics.py)."""
    import jax
    import jax.numpy as jnp

    from ocpg_tpu.data.loader import decompress_batch
    from ocpg_tpu.evaluation.davis_metrics import db_eval_boundary, db_eval_iou

    if "fwd" not in _VAL_FWD:
        @jax.jit
        def fwd(params, raw):
            batch = decompress_batch(raw)
            out = model.apply(
                params, batch["samples"], batch["samples_mask"],
                batch["text_ids"], batch["text_mask"],
                batch["targets"]["size"], train=False)
            return (jax.nn.sigmoid(out["pred_masks"][:, :, 0].astype(jnp.float32)),
                    batch["targets"]["masks"])
        _VAL_FWD["fwd"] = fwd

    js, fs = [], []
    for raw in batches:
        scores, masks = _VAL_FWD["fwd"](params, raw)
        pred = np.asarray(scores) > 0.5
        gt = np.asarray(masks) > 0.5
        for b in range(pred.shape[0]):
            for t in range(pred.shape[1]):
                js.append(float(db_eval_iou(gt[b, t], pred[b, t])))
                fs.append(float(db_eval_boundary(gt[b, t], pred[b, t])))
    return float(np.mean(js)), float(np.mean(fs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--ckpt_step", type=int, default=1000)
    ap.add_argument("--replay_steps", type=int, default=10)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--frames_per_video", type=int, default=16)
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--keep_params", default=None,
                    help="also save the FINAL trained params to this orbax "
                         "dir (persists after the temp ckpt dir is removed "
                         "— e.g. for trained-weights parity studies)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_loader import build_tree
    from ocpg_tpu.config import ytvos_r101_boxsup
    from ocpg_tpu.data.datasets import build_dataset
    from ocpg_tpu.data.loader import ClipLoader
    from ocpg_tpu.engine import build_optimizer, create_train_state, make_train_step
    from ocpg_tpu.engine.checkpoint import CheckpointManager
    from ocpg_tpu.models import build_model

    root = tempfile.mkdtemp(prefix="longrun_")
    ckpt_dir = tempfile.mkdtemp(prefix="longrun_ckpt_")
    try:
        t0 = time.time()
        build_tree(root, args.videos, args.frames_per_video)
        print(f"fixture tree built in {time.time() - t0:.1f}s", flush=True)

        cfg = ytvos_r101_boxsup().replace(compute_dtype="bfloat16")
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
        model, _, criterion_cfg, weight_dict = build_model(cfg)
        dataset = build_dataset("ytvos", root, "train", cfg.num_frames, "box")
        loader = ClipLoader(dataset, 1, canvas=(512, 640), train=True,
                            num_workers=args.workers,
                            text_vocab=cfg.text_vocab, compact=True)

        from ocpg_tpu.data.loader import decompress_batch

        host_raw = next(iter(loader.epoch(0)))
        host = jax.device_get(decompress_batch(host_raw))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), host["samples"], host["samples_mask"],
            host["text_ids"], host["text_mask"], host["targets"]["size"],
            targets=host["targets"], train=True))()
        optimizer = build_optimizer(cfg, lr_drop_steps=[10**9])
        state = create_train_state(params, optimizer)
        step_fn = jax.jit(
            make_train_step(model, criterion_cfg, weight_dict, optimizer),
            donate_argnums=(0,))
        mgr = CheckpointManager(ckpt_dir)

        def batches():
            for e in itertools.count():
                yield from loader.epoch(e)

        it = batches()
        losses_dev = []           # device scalars, fetched lazily
        curve_jf = []
        replay_batches, replay_losses = [], []
        val_batches = [next(it) for _ in range(2)]   # fixed probe batches

        t_run0 = time.time()
        saved_wall = None
        for step in range(args.steps):
            raw = next(it)
            state, metrics = step_fn(state, raw)
            losses_dev.append(metrics["loss"])
            if step + 1 == args.ckpt_step:
                jax.block_until_ready(metrics["loss"])
                t0 = time.time()
                mgr.save(step + 1, state)
                mgr.wait()
                saved_wall = time.time() - t0
                print(f"checkpoint saved at step {step + 1} "
                      f"({saved_wall:.1f}s)", flush=True)
            if args.ckpt_step <= step < args.ckpt_step + args.replay_steps:
                # the batches right after the save, kept for the replay check
                replay_batches.append(raw)
                replay_losses.append(metrics["loss"])
            if (step + 1) % args.eval_every == 0 or step == 0:
                j, fb = synthetic_val_jf(model, state.params, val_batches)
                curve_jf.append({"step": step + 1, "J": round(j, 4),
                                 "F": round(fb, 4)})
                done = float(losses_dev[-1])
                print(f"step {step + 1}: loss {done:.3f} J {j:.3f} "
                      f"F {fb:.3f} ({time.time() - t_run0:.0f}s)", flush=True)
        jax.block_until_ready(losses_dev[-1])
        wall_s = time.time() - t_run0
        curve = [float(v) for v in losses_dev]

        # --- resume-bit-exactness: restore the step-ckpt_step state and
        # replay the exact batches the live run saw next
        template = create_train_state(params, optimizer)
        restored = CheckpointManager(ckpt_dir).restore(template)
        assert int(restored.step) == args.ckpt_step, int(restored.step)
        replay = []
        st = restored
        for raw in replay_batches:
            st, m = step_fn(st, raw)
            replay.append(m["loss"])
        replay = [float(v) for v in replay]
        live = [float(v) for v in replay_losses]
        bit_exact = replay == live
        print(f"resume replay bit-exact: {bit_exact}", flush=True)

        if args.keep_params:
            final_mgr = CheckpointManager(args.keep_params)
            final_mgr.save(args.steps, state)
            final_mgr.wait()
            print(f"final trained state saved to {args.keep_params}", flush=True)

        artifact = {
            "backbone": "resnet101",
            "shape": "1x3f 512x640 bf16, loader-fed (compact wire), "
                     f"{args.workers} worker",
            "steps": args.steps,
            "wall_s": round(wall_s, 1),
            "ms_per_step_e2e": round(wall_s / args.steps * 1000, 1),
            "loss_first": curve[0],
            "loss_last50_mean": float(np.mean(curve[-50:])),
            "loss_min": float(np.min(curve)),
            "curve_every_20": [round(v, 3) for v in curve[::20]],
            "val_jf_curve": curve_jf,
            "checkpoint_step": args.ckpt_step,
            "checkpoint_save_wall_s": round(saved_wall, 2),
            "resume_replay_steps": len(replay_batches),
            "resume_bit_exact": bit_exact,
            "replay_losses_live": live,
            "replay_losses_restored": replay,
            "decreasing": bool(np.mean(curve[-50:]) < 0.5 * curve[0]),
        }
        out_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAIN_LONG_TPU.json")
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps({k: v for k, v in artifact.items()
                          if k not in ("curve_every_20",)}))
        print(f"wrote {out_path}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
