"""Serving-request bench: ClipInferenceEngine.run ms/request on the real chip.

Reproduces the PROFILE.md round-10 methodology (R101, 8 x 12-frame 360p
uint8 requests per engine.run, warm) and A/Bs the round-4 serving levers:

  * pipeline_depth 1 + f32 readback  — the round-3 engine (902 ms/request)
  * pipeline_depth 2 + f16 readback  — the round-4 default (double-buffered
    dispatch, half the readback bytes)

Unlike the compute benches this is deliberately an END-TO-END wall-clock
measurement — host assembly, tunnel upload, compute, and readback — because
that's exactly what the pipelining is supposed to overlap.  On a tunneled
host the absolute number is tunnel-bound; the A/B delta is the product
claim.  Writes SERVING_TPU.json at the repo root.

Usage: python scripts/bench_serving.py [--reqs 8] [--frames 12] [--rounds 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reqs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--backbone", default="resnet101")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ocpg_tpu.config import a2d_r101_boxsup
    from ocpg_tpu.engine.infer import ClipInferenceEngine, InferRequest
    from ocpg_tpu.models import build_model

    cfg = a2d_r101_boxsup().replace(compute_dtype="bfloat16",
                                    backbone=args.backbone)
    model, *_ = build_model(cfg)

    rng = np.random.default_rng(0)
    lt = 10
    reqs = []
    for _ in range(args.reqs):
        ids = np.full((lt,), 1, np.int32)
        ids[0] = 0
        ids[1:4] = rng.integers(4, 1000, 3)
        reqs.append(InferRequest(
            rng.integers(0, 256, (args.frames, args.height, args.width, 3)
                         ).astype(np.uint8),
            ids, np.ones((lt,), np.int32)))

    t, h, w = reqs[0].frames.shape[:3]
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3)),
        jnp.zeros((1, t, h, w), bool), jnp.zeros((1, lt), jnp.int32),
        jnp.ones((1, lt), jnp.int32), jnp.asarray([[h, w]], jnp.int32),
        train=False))()

    def measure(tag, **engine_kw):
        engine = ClipInferenceEngine(model, params, clip_len=args.frames,
                                     **engine_kw)
        engine.run(reqs)                      # warmup: compile + first upload
        times = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            engine.run(reqs)
            times.append((time.perf_counter() - t0) / len(reqs) * 1000)
        ms = sorted(times)[len(times) // 2]
        print(f"{tag}: {ms:.0f} ms/request (runs: "
              f"{[round(x) for x in times]})", flush=True)
        return round(ms, 1)

    results = {
        # round-3 configuration: synchronous dispatch, f32 readback
        "r3_sync_f32_ms_per_request": measure(
            "sync+f32 (round-3)", pipeline_depth=1, out_dtype=jnp.float32),
        # round-4 default: double-buffered dispatch, f16 readback
        "r4_pipelined_f16_ms_per_request": measure(
            "pipelined+f16 (round-4 default)", pipeline_depth=2,
            out_dtype=jnp.float16),
        # isolate the two levers
        "pipelined_f32_ms_per_request": measure(
            "pipelined+f32", pipeline_depth=2, out_dtype=jnp.float32),
        "sync_f16_ms_per_request": measure(
            "sync+f16", pipeline_depth=1, out_dtype=jnp.float16),
    }
    base = results["r3_sync_f32_ms_per_request"]
    new = results["r4_pipelined_f16_ms_per_request"]
    artifact = {
        "workload": f"{args.reqs} x {args.frames}-frame {args.height}x"
                    f"{args.width} uint8 requests per run(), {args.backbone}, "
                    "warm, median of rounds",
        "note": "end-to-end wall clock incl. host assembly + tunnel transfer "
                "(the thing pipelining overlaps); PROFILE.md round-10 "
                "measured 902 ms/request for the round-3 configuration on "
                "this host",
        **results,
        "speedup_vs_r3_config": round(base / new, 3),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SERVING_TPU.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    print(f"wrote {os.path.join(root, 'SERVING_TPU.json')}")


if __name__ == "__main__":
    main()
