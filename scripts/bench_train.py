"""Train-step throughput bench (and optional op-level profile) on the real TPU.

Usage:  python scripts/bench_train.py [--frames 3] [--height 512] [--width 640]
                                      [--backbone resnet101] [--iters 4]
                                      [--trace] [--out -]

Same chained-`lax.scan` methodology as bench.py: N train steps run inside one
jitted program with the TrainState as the scan carry, so iterations execute
sequentially on-device and only scalars return to the host — robust on the
tunneled "axon" platform where per-call timing measures tunnel latency.
Per-step time = median over 3 paired runs of (t_16iter - t_2iter) / 14 — the
wide separation swamps per-call dispatch-latency variance and the paired
median discards transient tunnel stalls (small-separation subtraction was
measured unstable; numbers cross-checked against jax.profiler device-time
totals).

This is the committed source of the PROFILE.md "Training step" numbers
(round-2 performance pass evidence; the reference equivalent is the eager
torch loop at /root/reference/engine.py:29-123).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def run_e2e(args, cfg, model, criterion_cfg, weight_dict):
    """Loader-in-the-loop train throughput: the chip fed by the real
    ClipLoader (native JPEG/h5 decode, transforms, static-canvas collate)
    from a synthetic on-disk Ref-YTVOS tree, with double-buffered device
    prefetch (parallel/mesh.py::prefetch_to_mesh).  The resident-batch
    single-dispatch loop is measured back to back as the device-bound
    floor, so the artifact separates device time from host/feed time.
    Reference equivalent: /root/reference/main.py:197-214.
    """
    import itertools
    import json
    import shutil
    import tempfile

    import jax

    from bench_loader import build_tree
    from ocpg_tpu.data.datasets import build_dataset
    from ocpg_tpu.data.loader import ClipLoader
    from ocpg_tpu.engine import build_optimizer, create_train_state, make_train_step
    from ocpg_tpu.parallel import create_mesh, prefetch_to_mesh, shard_batch

    root = tempfile.mkdtemp(prefix="e2ebench_")
    try:
        t0 = time.time()
        build_tree(root, args.e2e_videos, args.e2e_frames_per_video)
        print(f"fixture tree built in {time.time() - t0:.1f}s", flush=True)
        dataset = build_dataset("ytvos", root, "train", args.frames, "box")
        loader = ClipLoader(dataset, args.batch, canvas=(args.height, args.width),
                            train=True, num_workers=args.e2e_workers,
                            text_vocab=cfg.text_vocab, compact=True)

        from ocpg_tpu.data.loader import decompress_batch

        host_raw = next(iter(loader.epoch(0)))
        host = jax.device_get(decompress_batch(host_raw))
        params = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0),
            host["samples"], host["samples_mask"],
            host["text_ids"], host["text_mask"], host["targets"]["size"],
            targets=host["targets"], train=True))()
        optimizer = build_optimizer(cfg, lr_drop_steps=[10**9])
        state = create_train_state(params, optimizer)
        step_fn = jax.jit(
            make_train_step(model, criterion_cfg, weight_dict, optimizer),
            donate_argnums=(0,))

        mesh = create_mesh()

        def epochs():
            for e in itertools.count():
                yield from loader.epoch(e)

        it = prefetch_to_mesh(epochs(), mesh)

        # warmup: compile + loader spin-up
        for _ in range(4):
            _, dev = next(it)
            state, metrics = step_fn(state, dev)
        jax.block_until_ready(metrics["loss"])

        t0 = time.perf_counter()
        for _ in range(args.e2e):
            _, dev = next(it)
            state, metrics = step_fn(state, dev)
        float(metrics["loss"])                       # sync once at the end
        e2e_ms = (time.perf_counter() - t0) / args.e2e * 1000

        # device-bound floor: same jitted step, resident batch, async dispatch
        resident = shard_batch(mesh, host_raw)
        state, metrics = step_fn(state, resident)
        jax.block_until_ready(metrics["loss"])
        n_res = min(args.e2e, 50)
        t0 = time.perf_counter()
        for _ in range(n_res):
            state, metrics = step_fn(state, resident)
        float(metrics["loss"])
        resident_ms = (time.perf_counter() - t0) / n_res * 1000

        artifact = {
            "backbone": args.backbone,
            "shape": f"{args.batch}x{args.frames}f {args.height}x{args.width} bf16",
            "steps": args.e2e,
            "e2e_train_step_ms": round(e2e_ms, 1),
            "e2e_steps_per_sec": round(1000.0 / e2e_ms, 3),
            "resident_step_ms": round(resident_ms, 1),
            "feed_overhead_pct": round((e2e_ms / resident_ms - 1) * 100, 1),
            "loader_workers": args.e2e_workers,
            "host_cores": os.cpu_count(),
            "prefetch": "double-buffered device_put (prefetch_to_mesh)",
            "wire_format": "compact (uint8 frames + u8 masks + f16 heatmaps, "
                           "on-device normalize)",
        }
        out_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "E2E_TRAIN_TPU.json")
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps(artifact))
        print(f"wrote {out_path}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--iters_short", type=int, default=2)
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace and print the op breakdown")
    ap.add_argument("--trace_dir", default="/tmp/ocpg_profile_train")
    ap.add_argument("--e2e", type=int, default=0, metavar="N",
                    help="loader-in-the-loop mode: N train steps on the chip "
                         "fed by the real ClipLoader from a synthetic on-disk "
                         "YTVOS tree (720p JPEG + h5 heatmaps), with "
                         "double-buffered device prefetch.  Measures "
                         "sustained e2e steps/s vs the resident-batch step "
                         "and writes E2E_TRAIN_TPU.json at the repo root "
                         "(reference: torch DataLoader feeding the GPU, "
                         "/root/reference/main.py:197-214).")
    ap.add_argument("--json_out", default=None,
                    help="append one JSON line with the measured point "
                         "(used by the operating-point sweep)")
    ap.add_argument("--e2e_workers", type=int, default=4)
    ap.add_argument("--e2e_videos", type=int, default=4)
    ap.add_argument("--e2e_frames_per_video", type=int, default=24)
    ap.add_argument("--overfit", type=int, default=0, metavar="N",
                    help="instead of timing, run N optimizer steps on the one "
                         "fixed synthetic batch and print the loss trajectory "
                         "— on-real-TPU convergence evidence for the full "
                         "production config (the CPU-mesh equivalent is "
                         "tests/test_convergence.py). Writes TRAIN_TPU.json "
                         "at the repo root.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import ytvos_r101_boxsup
    from ocpg_tpu.models import build_model
    from ocpg_tpu.engine import build_optimizer, create_train_state, make_train_step
    from ocpg_tpu.data.synthetic import synthetic_batch

    cfg = ytvos_r101_boxsup().replace(compute_dtype="bfloat16",
                                      backbone=args.backbone,
                                      num_frames=args.frames)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)  # production default
    model, _, criterion_cfg, weight_dict = build_model(cfg)
    if args.e2e:
        run_e2e(args, cfg, model, criterion_cfg, weight_dict)
        return
    rng = np.random.default_rng(0)
    host = synthetic_batch(rng, batch=args.batch, frames=args.frames,
                           height=args.height, width=args.width)
    batch = {
        "samples": jnp.asarray(host["samples"]),
        "samples_mask": jnp.asarray(host["samples_mask"]),
        "text_ids": jnp.asarray(host["text_ids"]),
        "text_mask": jnp.asarray(host["text_mask"]),
        "targets": {k: jnp.asarray(v) for k, v in host["targets"].items()},
    }

    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        batch["samples"], batch["samples_mask"],
        batch["text_ids"], batch["text_mask"], batch["targets"]["size"],
        targets=batch["targets"], train=True))()
    optimizer = build_optimizer(cfg, lr_drop_steps=[10**9])
    state = create_train_state(params, optimizer)
    train_step = make_train_step(model, criterion_cfg, weight_dict, optimizer)

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def chained(state, batch, n_iters):
        def body(s, _):
            s, metrics = train_step(s, batch)
            return s, metrics["loss"]
        s, losses = jax.lax.scan(body, state, None, length=n_iters)
        return s, losses

    if args.overfit:
        # Convergence mode: N optimizer steps on the one fixed batch, loss
        # trajectory recorded.  Production config end to end — bf16, dropout
        # on, loss warmup schedule live — on the real chip; complements the
        # 8-device CPU-mesh convergence test (tests/test_convergence.py).
        import json

        curve, total, chunk = [], 0, 25
        while total < args.overfit:
            n = min(chunk, args.overfit - total)
            state, losses = chained(state, batch, n)
            curve.extend(float(v) for v in np.asarray(losses, np.float64))
            total += n
            print(f"step {total}: loss {curve[-1]:.3f}", flush=True)
        artifact = {
            "backbone": args.backbone,
            "shape": f"{args.batch}x{args.frames}f {args.height}x{args.width} bf16",
            "steps": total,
            "loss_first": curve[0],
            "loss_min10": float(np.mean(sorted(curve)[:10])),
            "loss_last10": float(np.mean(curve[-10:])),
            "curve_every_10": curve[::10],
            "converged": bool(np.mean(curve[-10:]) < 0.5 * curve[0]),
        }
        out_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAIN_TPU.json")
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"loss {curve[0]:.2f} -> {artifact['loss_last10']:.2f} "
              f"(mean of last 10) over {total} steps; wrote {out_path}")
        return

    print("warmup/compile ...", flush=True)
    state, losses = chained(state, batch, args.iters_short)
    state, losses = chained(state, batch, args.iters)
    float(losses[-1])

    # XLA cost-model FLOPs of one unchained step -> train MFU companion.
    # HLO flops count the MSDA Pallas custom calls as zero, so the analytic
    # executed-flop counter supplies the kernel-inclusive total; peak FLOP/s
    # comes from the attached device kind (ocpg_tpu.utils.hw), not a
    # hard-coded v5e constant (ADVICE r4).
    # NB: `import ocpg_tpu.ops.ms_deform_attn as X` would bind the
    # same-named FUNCTION re-exported by the ops package, not the module
    import importlib

    msda_ops = importlib.import_module("ocpg_tpu.ops.ms_deform_attn")

    try:
        with msda_ops.count_msda_flops() as msda_entries:
            lowered = jax.jit(train_step).lower(state, batch)
        flops_msda = float(sum(fl for _, fl in msda_entries))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)
        flops_per_step = flops_msda = 0.0

    def run_once(n_iters):
        nonlocal state, losses
        t0 = time.perf_counter()
        state, losses = chained(state, batch, n_iters)
        float(losses[-1])
        return time.perf_counter() - t0

    # median of paired long/short deltas (transient-stall robust, see bench.py)
    deltas = []
    for _ in range(3):
        t_long = run_once(args.iters)
        t_short = run_once(args.iters_short)
        deltas.append((t_long - t_short) / (args.iters - args.iters_short))
    dt = max(sorted(deltas)[len(deltas) // 2], 1e-9)
    fps = args.batch * args.frames / dt
    from ocpg_tpu.utils.hw import tpu_spec

    spec = tpu_spec()
    peak = spec.peak_flops_bf16
    mfu = flops_per_step / dt / peak if flops_per_step > 0 else 0.0
    mfu_incl = (flops_per_step + flops_msda) / dt / peak if flops_per_step > 0 else 0.0
    print(f"train step: {dt*1e3:.1f} ms/step = {fps:.1f} train-frames/sec/chip "
          f"(MFU hlo {mfu:.3f} / incl-pallas {mfu_incl:.3f}, "
          f"{flops_per_step/1e9:.0f}+{flops_msda/1e9:.0f} GFLOP/step, "
          f"peak {peak/1e12:.0f} TF {spec.kind}; "
          f"{args.backbone}, {args.batch}x{args.frames}f "
          f"{args.height}x{args.width} bf16), last loss {float(losses[-1]):.3f}")
    if args.json_out:
        import json

        rec = {
            "backbone": args.backbone, "batch": args.batch,
            "frames": args.frames, "height": args.height, "width": args.width,
            "step_ms": round(dt * 1e3, 1),
            "train_frames_per_sec_per_chip": round(fps, 2),
            "train_mfu": round(mfu, 4),
            "train_mfu_incl_custom_calls": round(mfu_incl, 4),
            "gflop_per_step": round(flops_per_step / 1e9, 1),
            "gflop_per_step_msda": round(flops_msda / 1e9, 1),
            "assumed_peak_tflops_bf16": round(peak / 1e12, 1),
            "tpu_kind": spec.kind,
        }
        with open(args.json_out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if args.trace:
        import glob

        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            state, losses = chained(state, batch, 2)
            float(losses[-1])
        paths = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                                 recursive=True), key=os.path.getmtime)
        assert paths, f"no xplane under {args.trace_dir}"
        data = jax.profiler.ProfileData.from_file(paths[-1])
        from profile_bench import categorize
        import collections

        candidates = []
        for plane in data.planes:
            if "TPU" not in (plane.name or "") and "/device:" not in (plane.name or ""):
                continue
            for line in plane.lines:
                evs = [(ev.name, int(ev.duration_ns)) for ev in line.events]
                if evs:
                    candidates.append((line.name or "?", evs))
        sync = [c for c in candidates if c[0] == "XLA Ops"]
        lname, evs = sync[0] if sync else max(
            candidates, key=lambda c: sum(d for n, d in c[1] if not n.startswith("%while")))
        per_op = collections.Counter()
        per_cat = collections.Counter()
        total = 0
        for name, dur in evs:
            if name.startswith("%while"):
                continue
            per_op[name] += dur
            per_cat[categorize(name)] += dur
            total += dur
        print(f"\ndevice total {total/1e6:.1f} ms over 2 steps "
              f"({total/2e6:.1f} ms/step)\n\n| category | ms | % |\n|---|---|---|")
        for cat, ns in per_cat.most_common():
            print(f"| {cat} | {ns/1e6:.2f} | {100*ns/max(total,1):.1f}% |")
        print("\n| op | ms | % |\n|---|---|---|")
        import re
        for name, ns in per_op.most_common(30):
            print(f"| `{re.sub(r'%s+', ' ', name)[:110]}` | {ns/1e6:.2f} "
                  f"| {100*ns/max(total,1):.1f}% |")


if __name__ == "__main__":
    main()
