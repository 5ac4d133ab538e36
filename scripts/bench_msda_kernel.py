"""MSDA kernel microbenchmark on the real TPU.

Times forward (and optionally backward) variants of the channel-major MSDA op
with the chained-scan + paired-median method validated in PROFILE.md:
per-call time = median over 5 paired runs of (t_long - t_short) / (n_long -
n_short), with the iterations chained inside one jitted lax.scan so the
tunneled platform's dispatch latency cannot distort the measurement.

Variants:
  cm      — production channel-major Pallas kernel (separable hat-matmuls,
            direct relu(1-|x-g|) hat rows); cm_hc = legacy corner hat rows
  r4      — rank-4 dense-row formulation (VPU outer product + full-K MXU pass)
  sep     — XLA separable matmul formulation
Shapes: --shapes eval (384x640 A2D bench) | train (512x640) | l0 (level-0 only)

Usage:  python scripts/bench_msda_kernel.py --variants cm r4 [--bwd] [--shapes eval]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

SHAPE_SETS = {
    "eval": ((48, 80), (24, 40), (12, 20), (6, 10)),
    "train": ((64, 80), (32, 40), (16, 20), (8, 10)),
    "l0": ((48, 80),),
    "l0train": ((64, 80),),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["cm", "cm_rep"],
                    choices=["cm", "cm_ps", "cm_xk", "cm_rep", "cm_hc",
                             "cm_rep_hc", "r4", "fk", "sep"])
    ap.add_argument("--shapes", default="eval", choices=list(SHAPE_SETS))
    ap.add_argument("--bwd", action="store_true",
                    help="also time the backward (cm and sep only)")
    ap.add_argument("--n", type=int, default=5, help="frames (batch)")
    ap.add_argument("--tile", type=int, default=0, help="override tile_q")
    ap.add_argument("--check", default="sep", choices=["sep", "cm", "none"],
                    help="correctness reference: 'sep' materializes huge XLA "
                         "separable intermediates at full eval shapes (can "
                         "thrash HBM on a 16GB chip) — 'cm' cross-checks "
                         "variants against the production kernel instead")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ocpg_tpu.ops.ms_deform_attn import ms_deform_attn_fast_cm
    from ocpg_tpu.ops.ms_deform_attn_pallas import (
        ms_deform_attn_pallas_cm, ms_deform_attn_pallas_cm_r4)

    shapes = SHAPE_SETS[args.shapes]
    n, m, d, p = args.n, 8, 32, 4
    l = len(shapes)
    s = sum(h * w for h, w in shapes)
    lq = s

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((n, s, m, d)), jnp.bfloat16)
    x_cm = jnp.asarray(rng.random((n, m, l, p, lq)), jnp.float32)
    y_cm = jnp.asarray(rng.random((n, m, l, p, lq)), jnp.float32)
    aw_raw = jnp.asarray(rng.random((n, m, l, p, lq)), jnp.float32)
    aw_cm = aw_raw / aw_raw.sum(axis=(2, 3), keepdims=True)
    g = jnp.asarray(rng.standard_normal((n, lq, m * d)), jnp.float32)

    def make_fn(variant):
        kw = {"tile_q": args.tile} if args.tile else {}
        if variant == "cm":      # production (ry @ REP matmul)
            return lambda v, x, y, a: ms_deform_attn_pallas_cm(v, shapes, x, y, a, **kw)
        if variant == "cm_ps":   # P points stacked into one dot per level/stage
            return lambda v, x, y, a: ms_deform_attn_pallas_cm(
                v, shapes, x, y, a, pstack=True, **kw)
        if variant == "cm_xk":   # backward-only knob: forward is production
            return lambda v, x, y, a: ms_deform_attn_pallas_cm(v, shapes, x, y, a, **kw)
        if variant == "cm_rep":  # pltpu.repeat lane-tiling instead of the matmul
            return lambda v, x, y, a: ms_deform_attn_pallas_cm(
                v, shapes, x, y, a, ryx_mm=False, **kw)
        if variant == "cm_hc":   # legacy floor/frac corner hat rows
            return lambda v, x, y, a: ms_deform_attn_pallas_cm(
                v, shapes, x, y, a, hat_direct=False, **kw)
        if variant == "cm_rep_hc":
            return lambda v, x, y, a: ms_deform_attn_pallas_cm(
                v, shapes, x, y, a, ryx_mm=False, hat_direct=False, **kw)
        if variant == "r4":
            return lambda v, x, y, a: ms_deform_attn_pallas_cm_r4(v, shapes, x, y, a, **kw)
        if variant == "fk":      # multi-level fused-K (block-diagonal stage dots)
            from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas_cm_fk
            return lambda v, x, y, a: ms_deform_attn_pallas_cm_fk(v, shapes, x, y, a, **kw)
        return lambda v, x, y, a: ms_deform_attn_fast_cm(v, shapes, x, y, a, "separable")

    def make_bwd(variant):
        impl = {"cm": "pallas", "cm_ps": "pallas_ps", "cm_xk": "pallas_xk",
                "cm_rep": "pallas_rep", "cm_hc": "pallas_hc",
                "cm_rep_hc": "pallas_rep_hc", "sep": "separable"}[variant]

        def loss(v, x, y, a):
            return (ms_deform_attn_fast_cm(v, shapes, x, y, a, impl)
                    .astype(jnp.float32) * g).sum()

        return jax.grad(loss, argnums=(0, 1, 2, 3))

    def timed(fn, label):
        @functools.partial(jax.jit, static_argnums=(1,))
        def chained(x0, iters):
            def body(carry, _):
                out = fn(value, x_cm + carry * 1e-6, y_cm, aw_cm)
                if isinstance(out, tuple):
                    nxt = sum(jnp.sum(o.astype(jnp.float32)) * 0 for o in out) + carry + 1
                else:
                    nxt = jnp.sum(out.astype(jnp.float32)) * 0 + carry + 1
                return nxt, ()
            c, _ = jax.lax.scan(body, x0, None, length=iters)
            return c

        def run(iters):
            c = chained(jnp.zeros(()), iters)
            c.block_until_ready()
            t0 = time.time()
            c = chained(jnp.zeros(()), iters)
            c.block_until_ready()
            return time.time() - t0

        run(2)  # warm both variants' compiles
        run(16)
        pairs = []
        for _ in range(5):
            t_long = run(16)
            t_short = run(2)
            pairs.append((t_long - t_short) / 14)
        ms = float(np.median(pairs) * 1000)
        print(f"{label}: {ms:.2f} ms/call", flush=True)
        return ms

    # correctness cross-check at these shapes before timing
    if args.check != "none":
        if args.check == "sep":
            ref = np.asarray(ms_deform_attn_fast_cm(
                value, shapes, x_cm, y_cm, aw_cm, "separable"), np.float32)
        else:
            ref = np.asarray(ms_deform_attn_pallas_cm(
                value, shapes, x_cm, y_cm, aw_cm), np.float32)
        for variant in args.variants:
            out = np.asarray(make_fn(variant)(value, x_cm, y_cm, aw_cm), np.float32)
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
            print(f"{variant}: max rel err vs {args.check} = {err:.2e}", flush=True)
            assert err < 2e-2, f"{variant} diverges"

    for variant in args.variants:
        timed(make_fn(variant), f"fwd/{variant}/{args.shapes}")
    if args.bwd:
        for variant in [v for v in args.variants if v != "r4"]:
            timed(make_bwd(variant), f"bwd/{variant}/{args.shapes}")


if __name__ == "__main__":
    main()
