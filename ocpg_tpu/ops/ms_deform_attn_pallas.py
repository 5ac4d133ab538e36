"""Pallas TPU kernel for multi-scale deformable attention (forward).

Replaces the reference CUDA kernel pair (`/root/reference/models/ops/src/cuda/
ms_deform_im2col_cuda.cuh:237-299` forward, `:301-921` backward) with a
formulation that never gathers: bilinear sampling is *separable*, so each
sampled value is

    out[q, d] = sum_w cx[q, w] * sum_h ry[q, h] * V[h, w, d]

where cx (resp. ry) is a "hat" row with at most two non-zeros — the
x-(resp. y-)bilinear corner weights, exactly zero outside the map
(grid_sample 'zeros' padding).  On TPU this becomes MXU matmuls:

    stage 1:  A    = cx @ V'         V' laid out (W, D*H)     -> (TQ, D*H)
    expand :  RYX  = (ry * attn) @ REP_l   REP replicates h-weights D times
    stage 2:  out  = concat_l(A_l * RYX_l) @ SEL              -> (TQ, L*D)
              acc  = sum over the L slabs                     -> (TQ, D)

REP_l (H, D*H) and SEL (sum_l D*H_l, L*D) are constant 0/1 matrices, so the
only VPU work is building the tiny hat rows and one wide bf16 multiply; the
per-level A intermediate lives in VMEM for one query tile.  The XLA lowering
of the same algebra (ms_deform_attn.py::ms_deform_attn_separable) round-trips
A through HBM — that is the fallback path and the source of the backward pass.

Measured on TPU v5e (bench shapes: S=5100, Lq=5100, M=8, D=32, L=4, P=4,
see PROFILE.md): XLA gather formulation 22.1 ms/call, XLA separable 6.7 ms,
this kernel 2.9 ms — and it removes the separate corner-weighting and
attention-reduction fusions that the gather path needs.

Gradients: `ms_deform_attn_fast` (ops/ms_deform_attn.py) wraps this forward
in a custom_vjp whose backward differentiates the XLA formulation, matching
the reference's five hand-written col2im CUDA variants via autodiff instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
Shapes = Tuple[Tuple[int, int], ...]


def _hat(center: Array, frac: Array, grid: Array) -> Array:
    """Two-corner bilinear weights on `grid` (..., K) for the corner pair
    (center, center+1) with fractions (1-frac, frac).  Corners outside the
    grid contribute zero — grid_sample 'zeros' padding semantics."""
    c = center[:, None]
    f = frac[:, None]
    return (jnp.maximum(0.0, 1.0 - jnp.abs(c - grid)) * (1.0 - f)
            + jnp.maximum(0.0, 1.0 - jnp.abs(c + 1.0 - grid)) * f)


def _hat_direct(x: Array, grid: Array) -> Array:
    """The same two-corner hat row computed directly: relu(1 - |x - grid|).

    Algebraically identical to `_hat(floor(x), x - floor(x), grid)` — the
    floor corner contributes (1-f) at grid==floor(x) and f at floor(x)+1,
    which is exactly the tent 1-|x-g| clipped at zero, including the OOB-zero
    (grid_sample 'zeros') semantics for corners outside [0, K-1].  4 VPU ops
    per row instead of ~11 (no floor/frac) — the hat build is pure VPU work
    that runs serial to the MXU stages, so this is measurable at kernel level.
    """
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - grid))


def _msda_kernel(levels, d, p, tile, tiles_per_chunk,
                 x_ref, y_ref, aw_ref, *rest):
    nl = len(levels)
    value_refs = rest[:nl]
    rep_refs = rest[nl:2 * nl]
    sel_ref = rest[2 * nl]
    out_ref = rest[-1]

    def tile_body(j, carry):
        q0 = pl.multiple_of(j * tile, tile)
        prods = []
        for l, (h, w) in enumerate(levels):
            x = x_ref[0, l, pl.ds(q0, tile)]
            y = y_ref[0, l, pl.ds(q0, tile)]
            aw = aw_ref[0, l, pl.ds(q0, tile)]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            iw = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1).astype(jnp.float32)
            cx = _hat(x0, x - x0, iw)                               # (tile, W)
            a = jnp.dot(cx.astype(jnp.bfloat16), value_refs[l][0],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)                      # (tile, D*H)
            ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
            ry = (_hat(y0, y - y0, ih) * aw[:, None]).astype(jnp.bfloat16)  # (tile, H)
            ryx = jnp.dot(ry, rep_refs[l][...],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)                    # (tile, D*H)
            prods.append(a * ryx)
        prod = jnp.concatenate(prods, axis=1)                       # (tile, sum D*H_l)
        out = jnp.dot(prod, sel_ref[...],
                      preferred_element_type=jnp.float32)           # (tile, L*D)
        acc = out[:, :d]
        for l in range(1, nl):
            acc = acc + out[:, l * d:(l + 1) * d]
        # rows are (query, point) with the point index fastest: reduce P here
        accp = acc.reshape(tile // p, p, d).sum(axis=1)
        out_ref[0, pl.ds(q0 // p, tile // p), :] = accp
        return carry

    jax.lax.fori_loop(0, tiles_per_chunk, tile_body, 0)


@functools.lru_cache(maxsize=None)
def _constants_np(spatial_shapes: Shapes, d: int):
    """REP_l (H_l, D*H_l) replicators and the block-diagonal SEL matrix as
    numpy bool arrays (only host data is cached — jnp conversion happens per
    trace, since staged constants are trace-local tracers)."""
    import numpy as np

    reps, sel_blocks = [], []
    nl = len(spatial_shapes)
    for li, (h, _) in enumerate(spatial_shapes):
        lanes = np.arange(d * h)
        reps.append((lanes[None, :] % h) == np.arange(h)[:, None])
        sel_blocks.append(
            ((lanes[:, None] // h + li * d) == np.arange(nl * d)[None, :]))
    return reps, np.concatenate(sel_blocks, axis=0)


def _constants(spatial_shapes: Shapes, d: int):
    reps_np, sel_np = _constants_np(spatial_shapes, d)
    return ([jnp.asarray(r, jnp.bfloat16) for r in reps_np],
            jnp.asarray(sel_np, jnp.bfloat16))


@functools.partial(jax.jit, static_argnums=(1, 4, 5))
def ms_deform_attn_pallas(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    sampling_locations: Array,    # (N, Lq, M, L, P, 2) in [0, 1]
    attention_weights: Array,     # (N, Lq, M, L, P)
    tile_q: int = 512,
    interpret: bool = False,      # CPU-debuggable interpreter mode (tests)
) -> Array:                       # (N, Lq, M * D)
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes)
    nm = n * m
    lqp = lq * p

    # per-level values in (NM, W, D*H) layout so stage-2 lanes are dd*H+hh
    value_nm = value.transpose(0, 2, 1, 3).reshape(nm, s, d)
    v_levels = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value_nm, start, h * w, axis=1)
        v = v.reshape(nm, h, w, d).transpose(0, 2, 3, 1).reshape(nm, w, d * h)
        v_levels.append(v.astype(jnp.bfloat16))
        start += h * w

    # per-level query params folded to (NM, L, LQP) f32
    loc = sampling_locations.astype(jnp.float32)
    aw = attention_weights.astype(jnp.float32)
    ws = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    hs = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    x = loc[..., 0] * ws[None, None, None, :, None] - 0.5     # (N,Lq,M,L,P)
    y = loc[..., 1] * hs[None, None, None, :, None] - 0.5

    # tiles hold whole (query, point) groups for the in-kernel P-sum and stay
    # sublane-aligned on both the (tile) input rows and the (tile//p) output
    # rows: the tile unit is lcm(128, p)
    import math

    unit = 128 * p // math.gcd(128, p)
    tile_q = max(unit, (min(tile_q, -(-lqp // unit) * unit) // unit) * unit)
    pad = (-lqp) % tile_q

    def fold_pad(a):  # (N, Lq, M, L, P) -> (NM, L, LQP [+pad])
        a = a.transpose(0, 2, 3, 1, 4).reshape(nm, l, lqp)
        return jnp.pad(a, ((0, 0), (0, 0), (0, pad))) if pad else a

    # only x, y, attn cross into the kernel (floor/frac computed in-kernel):
    # 3 layout transposes instead of 5, and the f32 output is P-reduced inside
    xf, yf, awf = fold_pad(x), fold_pad(y), fold_pad(aw)
    qtot = lqp + pad
    n_tiles = qtot // tile_q
    # a chunk of several tiles amortizes grid-step overhead while keeping the
    # per-block VMEM footprint (qparams + out slab) small
    tiles_per_chunk = min(n_tiles, 8)
    while n_tiles % tiles_per_chunk:
        tiles_per_chunk -= 1
    chunk = tile_q * tiles_per_chunk
    n_chunks = qtot // chunk

    reps, sel = _constants(spatial_shapes, d)
    tothd = sel.shape[0]

    qspec = pl.BlockSpec((1, l, chunk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    vspecs = [pl.BlockSpec((1, w, d * h), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    rspecs = [pl.BlockSpec((h, d * h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    sspec = pl.BlockSpec((tothd, l * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_msda_kernel, spatial_shapes, d, p, tile_q,
                          tiles_per_chunk),
        out_shape=jax.ShapeDtypeStruct((nm, qtot // p, d), jnp.float32),
        grid=(nm, n_chunks),
        in_specs=[qspec] * 3 + vspecs + rspecs + [sspec],
        out_specs=pl.BlockSpec((1, chunk // p, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, yf, awf, *v_levels, *reps, sel)

    out = out[:, :lq]
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(
        n, lq, m * d).astype(value.dtype)


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    """Probe whether the production (channel-major) kernel compiles and runs
    on the default backend."""
    try:
        import numpy as np

        v = jnp.asarray(np.random.default_rng(0).random((1, 20, 2, 8)), jnp.float32)
        x = jnp.asarray(np.random.default_rng(1).random((1, 2, 1, 2, 3)), jnp.float32)
        y = jnp.asarray(np.random.default_rng(2).random((1, 2, 1, 2, 3)), jnp.float32)
        attn = jnp.ones((1, 2, 1, 2, 3), jnp.float32) / 2
        out = ms_deform_attn_pallas_cm(v, ((4, 5),), x, y, attn, 128)
        return bool(jnp.isfinite(out).all())
    except Exception:
        return False


# --------------------------------------------------------------------------
# Backward kernel: gradients for value / sampling locations / attention
# weights as transposed hat-matmuls, replacing the reference's five col2im
# CUDA variants (ms_deform_im2col_cuda.cuh:301-921) AND the XLA autodiff of
# the separable formulation (whose (NM, LQP, H*D) f32 cotangent buffers
# dominate the train step — see PROFILE.md "Training step").
#
# Math (per level, rows i = (query, point) pairs, lanes dh = d*H + h):
#   A    = cx @ V'                      (recomputed, not stored)
#   out  = P-sum over rows of (A * (ry @ REP)) @ SEL
#   dA   = gxH * ryx          gxH = g @ REPD   (g replicated over h lanes)
#   dV'  += cx^T @ dA                   (accumulated across query chunks)
#   dcx  = dA @ V'^T ;  dx = sum_w dcx * (h1x - h0x)        * W  (outside)
#   dry  = (gxH * A) @ REP^T
#   daw  = sum_h dry * hy ;  dy = aw * sum_h dry * (h1y - h0y) * H (outside)
# --------------------------------------------------------------------------


def _hat_pair(center, frac, grid):
    c = center[:, None]
    h0 = jnp.maximum(0.0, 1.0 - jnp.abs(c - grid))
    h1 = jnp.maximum(0.0, 1.0 - jnp.abs(c + 1.0 - grid))
    return h0, h1, h0 * (1.0 - frac[:, None]) + h1 * frac[:, None]


def _hat_and_deriv_direct(v: Array, grid: Array):
    """(hat row, d hat/dv row) computed without floor/frac.

    hat(v, g) = relu(1 - |v - g|); its RIGHT-SIDED derivative row is
    +1 on 0 < g-v <= 1, -1 on -1 < g-v <= 0, 0 outside — identical to the
    corner form `h1 - h0` (spikes -1 at floor(v), +1 at floor(v)+1)
    EVERYWHERE, including exactly-integer v.  The right-sided convention is
    load-bearing: at f32 bench scale (~3M sampling coords) dozens of
    coordinates land exactly on integers, and the gather oracle's autodiff
    (and the reference CUDA col2im, ms_deform_im2col_cuda.cuh:301+, whose
    floor/frac algebra bakes in the same convention) produce the right-sided
    subgradient there — an `open-interval sign(g-v)` form returned 0 and
    failed on-chip parity by 20% max-rel (TPU_PARITY.json history).
    ~10 VPU ops per axis instead of ~16 via `_hat_pair`."""
    t = grid - v[:, None]
    at = jnp.abs(t)
    deriv = jnp.where((t > -1.0) & (t <= 1.0),
                      jnp.where(t > 0.0, 1.0, -1.0), 0.0)
    return jnp.maximum(0.0, 1.0 - at), deriv


def _msda_bwd_kernel(levels, d, p, tile, tiles_per_chunk,
                     x_ref, y_ref, aw_ref, g_ref, *rest):
    nl = len(levels)
    value_refs = rest[:nl]
    rep_refs = rest[nl:2 * nl]
    repd_refs = rest[2 * nl:3 * nl]
    dv_refs = rest[3 * nl:4 * nl]
    dx_ref, dy_ref, daw_ref = rest[4 * nl:4 * nl + 3]
    j_chunk = pl.program_id(1)

    def tile_body(j, carry):
        q0 = pl.multiple_of(j * tile, tile)
        gq = g_ref[0, pl.ds(q0 // p, tile // p), :]                # (tile/p, D)
        gt = jnp.broadcast_to(gq[:, None, :], (tile // p, p, d)
                              ).reshape(tile, d).astype(jnp.bfloat16)
        for l, (h, w) in enumerate(levels):
            x = x_ref[0, l, pl.ds(q0, tile)]
            y = y_ref[0, l, pl.ds(q0, tile)]
            aw = aw_ref[0, l, pl.ds(q0, tile)]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            iw = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1).astype(jnp.float32)
            ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
            h0x, h1x, cx = _hat_pair(x0, x - x0, iw)               # (tile, W)
            hy0, hy1, hy = _hat_pair(y0, y - y0, ih)               # (tile, H)
            ry = (hy * aw[:, None]).astype(jnp.bfloat16)
            cx_b = cx.astype(jnp.bfloat16)

            gxH = jnp.dot(gt, repd_refs[l][...],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)                   # (tile, D*H)
            ryx = jnp.dot(ry, rep_refs[l][...],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
            a = jnp.dot(cx_b, value_refs[l][0],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            da = gxH * ryx

            dv_part = jax.lax.dot_general(
                cx_b, da, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                # (W, D*H)

            first = jnp.logical_and(j_chunk == 0, j == 0)

            @pl.when(first)
            def _():
                dv_refs[l][0] = dv_part

            @pl.when(jnp.logical_not(first))
            def _():
                dv_refs[l][0] = dv_refs[l][0] + dv_part

            dcx = jax.lax.dot_general(
                da, value_refs[l][0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)                # (tile, W)
            dx_ref[0, l, pl.ds(q0, tile)] = (dcx * (h1x - h0x)).sum(axis=1)

            dry = jax.lax.dot_general(
                gxH * a, rep_refs[l][...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)                # (tile, H)
            daw_ref[0, l, pl.ds(q0, tile)] = (dry * hy).sum(axis=1)
            dy_ref[0, l, pl.ds(q0, tile)] = aw * (dry * (hy1 - hy0)).sum(axis=1)
        return carry

    jax.lax.fori_loop(0, tiles_per_chunk, tile_body, 0)


@functools.lru_cache(maxsize=None)
def _repd_np(spatial_shapes: Shapes, d: int):
    """REPD_l (D, D*H_l): replicate g over the h lanes (lane dh = dd*H + hh)."""
    import numpy as np

    out = []
    for (h, _) in spatial_shapes:
        lanes = np.arange(d * h)
        out.append((lanes[None, :] // h) == np.arange(d)[:, None])
    return out


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def ms_deform_attn_pallas_bwd(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    sampling_locations: Array,    # (N, Lq, M, L, P, 2)
    attention_weights: Array,     # (N, Lq, M, L, P)
    grad_out: Array,              # (N, Lq, M*D) cotangent
    tile_q: int = 256,
    interpret: bool = False,
):
    """Returns (d_value, d_sampling_locations, d_attention_weights)."""
    import math

    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    nm = n * m
    lqp = lq * p

    value_nm = value.transpose(0, 2, 1, 3).reshape(nm, s, d)
    v_levels = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value_nm, start, h * w, axis=1)
        v_levels.append(v.reshape(nm, h, w, d).transpose(0, 2, 3, 1)
                        .reshape(nm, w, d * h).astype(jnp.bfloat16))
        start += h * w

    loc = sampling_locations.astype(jnp.float32)
    aw = attention_weights.astype(jnp.float32)
    ws = jnp.asarray([w for _, w in spatial_shapes], jnp.float32)
    hs = jnp.asarray([h for h, _ in spatial_shapes], jnp.float32)
    x = loc[..., 0] * ws[None, None, None, :, None] - 0.5
    y = loc[..., 1] * hs[None, None, None, :, None] - 0.5

    unit = 128 * p // math.gcd(128, p)
    tile_q = max(unit, (min(tile_q, -(-lqp // unit) * unit) // unit) * unit)
    pad = (-lqp) % tile_q

    def fold_pad(a):
        a = a.transpose(0, 2, 3, 1, 4).reshape(nm, l, lqp)
        return jnp.pad(a, ((0, 0), (0, 0), (0, pad))) if pad else a

    xf, yf, awf = fold_pad(x), fold_pad(y), fold_pad(aw)
    qtot = lqp + pad
    n_tiles = qtot // tile_q
    tiles_per_chunk = min(n_tiles, 8)
    while n_tiles % tiles_per_chunk:
        tiles_per_chunk -= 1
    chunk = tile_q * tiles_per_chunk
    n_chunks = qtot // chunk

    # g folded to (NM, QTOT/P, D), zero in the padded tail
    g = grad_out.astype(jnp.float32).reshape(n, lq, m, d).transpose(0, 2, 1, 3)
    g = g.reshape(nm, lq, d)
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad // p), (0, 0)))

    reps, _ = _constants(spatial_shapes, d)
    repds = [jnp.asarray(r, jnp.bfloat16) for r in _repd_np(spatial_shapes, d)]

    qspec = pl.BlockSpec((1, l, chunk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, chunk // p, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    vspecs = [pl.BlockSpec((1, w, d * h), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    rspecs = [pl.BlockSpec((h, d * h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    rdspecs = [pl.BlockSpec((d, d * h), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
               for (h, w) in spatial_shapes]
    dv_specs = [pl.BlockSpec((1, w, d * h), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for (h, w) in spatial_shapes]
    dq_spec = pl.BlockSpec((1, l, chunk), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct((nm, w, d * h), jnp.float32)
         for (h, w) in spatial_shapes]
        + [jax.ShapeDtypeStruct((nm, l, qtot), jnp.float32)] * 3
    )
    outs = pl.pallas_call(
        functools.partial(_msda_bwd_kernel, spatial_shapes, d, p, tile_q,
                          tiles_per_chunk),
        out_shape=tuple(out_shapes),
        grid=(nm, n_chunks),
        in_specs=[qspec] * 3 + [gspec] + vspecs + rspecs + rdspecs,
        out_specs=tuple(dv_specs + [dq_spec] * 3),
        interpret=interpret,
    )(xf, yf, awf, g, *v_levels, *reps, *repds)
    dvs = outs[:l]
    dxg, dyg, dawg = outs[l:]

    # d_value: reverse the (NM, W, D*H) layout and undo the head fold
    dv_parts = []
    for (hh, ww), dv in zip(spatial_shapes, dvs):
        dv = dv.reshape(nm, ww, d, hh).transpose(0, 3, 1, 2)   # (NM, H, W, D)
        dv_parts.append(dv.reshape(nm, hh * ww, d))
    d_value = jnp.concatenate(dv_parts, axis=1).reshape(n, m, s, d)
    d_value = d_value.transpose(0, 2, 1, 3).astype(value.dtype)

    def unfold(a):  # (NM, L, QTOT) -> (N, Lq, M, L, P)
        a = a[:, :, :lqp].reshape(n, m, l, lq, p)
        return a.transpose(0, 3, 1, 2, 4)

    d_x = unfold(dxg) * ws[None, None, None, :, None]
    d_y = unfold(dyg) * hs[None, None, None, :, None]
    d_loc = jnp.stack([d_x, d_y], axis=-1).astype(sampling_locations.dtype)
    d_attn = unfold(dawg).astype(attention_weights.dtype)
    return d_value, d_loc, d_attn


# --------------------------------------------------------------------------
# Channel-major (CM) kernels: query params arrive as (NM, L, P, LQ) instead
# of (NM, L, LQ*P).  Two structural wins over the row-folded kernels above:
#   1. The model can produce this layout with ONE cheap 2D transpose of the
#      (N, Lq, M*L*P) Dense output — the row-folded layout needs 5D
#      tiny-minor-dim transposes that cost ~16 ms/step at train shapes
#      (see PROFILE.md).
#   2. P becomes an inner loop, so the point-sum happens BEFORE the SEL
#      selector matmul: SEL (the kernel's largest matmul, K = sum_l D*H_l)
#      runs once per query row instead of once per (query, point) row — a
#      P-fold FLOP cut of that stage.  (SEL is linear, so summing products
#      over P first is algebraically identical.)
# Gradients: `ms_deform_attn_fast_cm` (ops/ms_deform_attn.py) pairs the CM
# forward with `ms_deform_attn_pallas_bwd_cm`, whose dq outputs are written
# directly in CM layout — no unfold transposes on the backward either.
# --------------------------------------------------------------------------


def _msda_cm_kernel(levels, d, p, tile, tiles_per_chunk, ryx_mm, hat_direct,
                    pstack, x_ref, y_ref, aw_ref, *rest):
    nl = len(levels)
    value_refs = rest[:nl]
    rep_refs = rest[nl:2 * nl] if ryx_mm else None
    sel_ref = rest[2 * nl] if ryx_mm else rest[nl]
    out_ref = rest[-1]

    def hat(v, grid):
        if hat_direct:
            return _hat_direct(v, grid)
        v0 = jnp.floor(v)
        return _hat(v0, v - v0, grid)

    def tile_body(j, carry):
        q0 = pl.multiple_of(j * tile, tile)
        prods = []
        for l, (h, w) in enumerate(levels):
            if pstack:
                # P points stacked on the sublane axis: one (P*tile, W) and
                # one (P*tile, H) dot per level instead of 2P small dots —
                # identical MXU row-steps, P-fold fewer issued matmuls
                # (A/B knob; see PROFILE.md for the measurement).  Hats are
                # built per point as (tile, K) and sublane-concatenated
                # (Mosaic cannot lower a (P, tile) -> (P*tile,) reshape).
                iw = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1).astype(jnp.float32)
                ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
                cxs, rys = [], []
                for pi in range(p):
                    x = x_ref[0, l, pi, pl.ds(q0, tile)] * w - 0.5
                    y = y_ref[0, l, pi, pl.ds(q0, tile)] * h - 0.5
                    aw = aw_ref[0, l, pi, pl.ds(q0, tile)]
                    cxs.append(hat(x, iw))
                    rys.append(hat(y, ih) * aw[:, None])
                cx = jnp.concatenate(cxs, axis=0)                    # (P*tile, W)
                ry = jnp.concatenate(rys, axis=0).astype(jnp.bfloat16)
                a = jnp.dot(cx.astype(jnp.bfloat16), value_refs[l][0],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)                   # (P*tile, D*H)
                if ryx_mm:
                    ryx = jnp.dot(ry, rep_refs[l][...],
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)             # (P*tile, D*H)
                else:
                    ryx = pltpu.repeat(ry, d, axis=1)
                prod = (a * ryx).astype(jnp.float32)
                acc = None                                           # P-sum
                for pi in range(p):
                    part = prod[pi * tile:(pi + 1) * tile, :]
                    acc = part if acc is None else acc + part
                prods.append(acc.astype(jnp.bfloat16))
                continue
            iw = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1).astype(jnp.float32)
            ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
            acc = None
            for pi in range(p):
                x = x_ref[0, l, pi, pl.ds(q0, tile)] * w - 0.5
                y = y_ref[0, l, pi, pl.ds(q0, tile)] * h - 0.5
                aw = aw_ref[0, l, pi, pl.ds(q0, tile)]
                cx = hat(x, iw)                                      # (tile, W)
                a = jnp.dot(cx.astype(jnp.bfloat16), value_refs[l][0],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)                   # (tile, D*H)
                ry = (hat(y, ih) * aw[:, None]).astype(jnp.bfloat16)
                if ryx_mm:
                    ryx = jnp.dot(ry, rep_refs[l][...],
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)             # (tile, D*H)
                else:
                    # ryx[q, dd*H + hh] = ry[q, hh]: a pure lane tiling —
                    # VPU copies instead of an MXU pass whose K = H_l (6..64)
                    # sits far under the 128-deep array (PROFILE.md round 6)
                    ryx = pltpu.repeat(ry, d, axis=1)                # (tile, D*H)
                # P-sum before SEL in f32 (bf16 accumulation measured the
                # same speed and costs precision — the kernel is matmul-MFU
                # bound, ~35% at these shapes, PROFILE.md)
                prod = (a * ryx).astype(jnp.float32)
                acc = prod if acc is None else acc + prod
            prods.append(acc.astype(jnp.bfloat16))
        prod = jnp.concatenate(prods, axis=1)                        # (tile, sum D*H_l)
        out = jnp.dot(prod, sel_ref[...],
                      preferred_element_type=jnp.float32)            # (tile, L*D)
        acc = out[:, :d]
        for l in range(1, nl):
            acc = acc + out[:, l * d:(l + 1) * d]
        out_ref[0, pl.ds(q0, tile), :] = acc
        return carry

    jax.lax.fori_loop(0, tiles_per_chunk, tile_body, 0)


def _fold_value_levels(value, spatial_shapes):
    """(N, S, M, D) -> per-level (NM, W, D*H) bf16 operands."""
    n, s, m, d = value.shape
    nm = n * m
    value_nm = value.transpose(0, 2, 1, 3).reshape(nm, s, d)
    v_levels = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value_nm, start, h * w, axis=1)
        v = v.reshape(nm, h, w, d).transpose(0, 2, 3, 1).reshape(nm, w, d * h)
        v_levels.append(v.astype(jnp.bfloat16))
        start += h * w
    return v_levels


def _cm_tiling(lq: int, tile_q: int):
    tile_q = max(128, (min(tile_q, -(-lq // 128) * 128) // 128) * 128)
    pad = (-lq) % tile_q
    qtot = lq + pad
    n_tiles = qtot // tile_q
    tiles_per_chunk = min(n_tiles, 8)
    while n_tiles % tiles_per_chunk:
        tiles_per_chunk -= 1
    return tile_q, pad, qtot, tile_q * tiles_per_chunk, tiles_per_chunk


@functools.partial(jax.jit, static_argnums=(1, 5, 6, 7, 8, 9))
def ms_deform_attn_pallas_cm(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    x_cm: Array,                  # (N, M, L, P, Lq)  normalized [0, 1]
    y_cm: Array,                  # (N, M, L, P, Lq)
    aw_cm: Array,                 # (N, M, L, P, Lq)
    tile_q: int = 512,
    interpret: bool = False,
    # ryx expansion: True = ry @ REP matmul (production; the pltpu.repeat
    # lane tiling measured 2x slower on-chip — PROFILE.md round-7, Mosaic
    # lowers the D-fold tiling as serial VPU copies on the critical path)
    ryx_mm: bool = True,
    # hat rows built directly as relu(1-|x-g|) (4 VPU ops) instead of via
    # floor/frac corner form (~11); bit-identical output on-chip, fwd
    # 9.72 -> 7.50 ms/call at eval shapes (PROFILE.md round-6) — A/B via
    # scripts/bench_msda_kernel.py --variants cm cm_hc
    hat_direct: bool = True,
    # stack the P points on the sublane axis so each level issues one
    # (P*tile, W) + one (P*tile, H) dot instead of 2P small dots — same MXU
    # row-steps, P-fold fewer issued matmuls (A/B via bench variants
    # cm_ps; see PROFILE.md for the on-chip measurement)
    pstack: bool = False,
) -> Array:                       # (N, Lq, M * D)
    n, s, m, d = value.shape
    _, _, l, p, lq = x_cm.shape
    assert l == len(spatial_shapes)
    nm = n * m

    v_levels = _fold_value_levels(value, spatial_shapes)
    tile_q, pad, qtot, chunk, tiles_per_chunk = _cm_tiling(lq, tile_q)
    n_chunks = qtot // chunk

    def fold(a):  # (N, M, L, P, Lq) -> (NM, L, P, LQ[+pad]) — reshape + pad only
        a = a.astype(jnp.float32).reshape(nm, l, p, lq)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else a

    xf, yf, awf = fold(x_cm), fold(y_cm), fold(aw_cm)
    reps, sel = _constants(spatial_shapes, d)
    tothd = sel.shape[0]

    qspec = pl.BlockSpec((1, l, p, chunk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    vspecs = [pl.BlockSpec((1, w, d * h), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    rspecs = [pl.BlockSpec((h, d * h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    sspec = pl.BlockSpec((tothd, l * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)

    rep_in_specs = rspecs if ryx_mm else []
    rep_args = reps if ryx_mm else []
    out = pl.pallas_call(
        functools.partial(_msda_cm_kernel, spatial_shapes, d, p, tile_q,
                          tiles_per_chunk, ryx_mm, hat_direct, pstack),
        out_shape=jax.ShapeDtypeStruct((nm, qtot, d), jnp.float32),
        grid=(nm, n_chunks),
        in_specs=[qspec] * 3 + vspecs + rep_in_specs + [sspec],
        out_specs=pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, yf, awf, *v_levels, *rep_args, sel)

    out = out[:, :lq]
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(
        n, lq, m * d).astype(value.dtype)


# --------------------------------------------------------------------------
# Rank-4 dense-row formulation (PROFILE.md round-3 closing): instead of the
# separable two-stage hat-matmuls (K = W_l then H_l, both under the MXU's
# 128-deep pass), build the per-query dense sampling row
#     M_q[h, w] = sum_p ry_p[h] * cx_p[w]
# on the VPU (outer-product broadcast-multiply, lane-padded W -> mult of 128)
# and contract ONCE per query with a full-K MXU pass:
#     out_q = M_q.flatten() @ V[(h, w), d]        K = H * Wpad
# FLOP trade: stage-1 matmul volume drops P-fold and the REP/SEL matmuls
# vanish, at the cost of (tile, H, Wpad) VPU expansion work and a 25%-lane
# output (N = D = 32).  Built to be MEASURED against the production CM
# kernel (scripts/bench_msda_kernel.py); see PROFILE.md for the verdict.
# --------------------------------------------------------------------------


def _round_up_128(x: int) -> int:
    return -(-x // 128) * 128


def _msda_cm_r4_kernel(levels, d, p, tile, tiles_per_chunk,
                       x_ref, y_ref, aw_ref, *rest):
    nl = len(levels)
    value_refs = rest[:nl]
    out_ref = rest[-1]

    def tile_body(j, carry):
        q0 = pl.multiple_of(j * tile, tile)
        acc_out = None
        for l, (h, w) in enumerate(levels):
            wp = _round_up_128(w)
            iw = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1).astype(jnp.float32)
            ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
            in_map = (iw < w).astype(jnp.float32)
            acc_m = None
            for pi in range(p):
                x = x_ref[0, l, pi, pl.ds(q0, tile)] * w - 0.5
                y = y_ref[0, l, pi, pl.ds(q0, tile)] * h - 0.5
                aw = aw_ref[0, l, pi, pl.ds(q0, tile)]
                x0 = jnp.floor(x)
                y0 = jnp.floor(y)
                # padded lanes masked: a corner at lane >= W is outside the
                # map and must contribute zero (grid_sample 'zeros')
                cx = _hat(x0, x - x0, iw) * in_map                   # (tile, Wp)
                ry = _hat(y0, y - y0, ih) * aw[:, None]              # (tile, H)
                m = ry[:, :, None] * cx[:, None, :]                  # (tile, H, Wp)
                acc_m = m if acc_m is None else acc_m + m
            mflat = acc_m.reshape(tile, h * wp).astype(jnp.bfloat16)
            o = jnp.dot(mflat, value_refs[l][0],
                        preferred_element_type=jnp.float32)          # (tile, D)
            acc_out = o if acc_out is None else acc_out + o
        out_ref[0, pl.ds(q0, tile), :] = acc_out
        return carry

    jax.lax.fori_loop(0, tiles_per_chunk, tile_body, 0)


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def ms_deform_attn_pallas_cm_r4(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    x_cm: Array,                  # (N, M, L, P, Lq) normalized [0, 1]
    y_cm: Array,
    aw_cm: Array,
    tile_q: int = 128,
    interpret: bool = False,
) -> Array:                       # (N, Lq, M * D)
    n, s, m, d = value.shape
    _, _, l, p, lq = x_cm.shape
    nm = n * m

    # per-level values in (NM, H*Wpad, D) layout (row index = h*Wpad + w)
    value_nm = value.transpose(0, 2, 1, 3).reshape(nm, s, d)
    v_levels = []
    start = 0
    for (h, w) in spatial_shapes:
        wp = _round_up_128(w)
        v = jax.lax.dynamic_slice_in_dim(value_nm, start, h * w, axis=1)
        v = v.reshape(nm, h, w, d)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        v_levels.append(v.reshape(nm, h * wp, d).astype(jnp.bfloat16))
        start += h * w

    tile_q, pad, qtot, chunk, tiles_per_chunk = _cm_tiling(lq, tile_q)
    n_chunks = qtot // chunk

    def fold(a):
        a = a.astype(jnp.float32).reshape(nm, l, p, lq)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else a

    xf, yf, awf = fold(x_cm), fold(y_cm), fold(aw_cm)

    qspec = pl.BlockSpec((1, l, p, chunk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    vspecs = [pl.BlockSpec((1, h * _round_up_128(w), d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]

    out = pl.pallas_call(
        functools.partial(_msda_cm_r4_kernel, spatial_shapes, d, p, tile_q,
                          tiles_per_chunk),
        out_shape=jax.ShapeDtypeStruct((nm, qtot, d), jnp.float32),
        grid=(nm, n_chunks),
        in_specs=[qspec] * 3 + vspecs,
        out_specs=pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, yf, awf, *v_levels)

    out = out[:, :lq]
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(
        n, lq, m * d).astype(value.dtype)


def _msda_cm_bwd_kernel(levels, d, p, tile, tiles_per_chunk, ryx_mm,
                        hat_direct, pstack, xk, x_ref, y_ref, aw_ref, g_ref,
                        *rest):
    nl = len(levels)
    value_refs = rest[:nl]
    rep_refs = rest[nl:2 * nl]
    repd_refs = rest[2 * nl:3 * nl]
    dv_refs = rest[3 * nl:4 * nl]
    dx_ref, dy_ref, daw_ref = rest[4 * nl:4 * nl + 3]
    j_chunk = pl.program_id(1)

    def hat_and_deriv(v, grid):
        if hat_direct:
            return _hat_and_deriv_direct(v, grid)
        v0 = jnp.floor(v)
        h0, h1, full = _hat_pair(v0, v - v0, grid)
        return full, h1 - h0

    def tile_body(j, carry):
        q0 = pl.multiple_of(j * tile, tile)
        gt = g_ref[0, pl.ds(q0, tile), :].astype(jnp.bfloat16)       # (tile, D)
        for l, (h, w) in enumerate(levels):
            iw = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1).astype(jnp.float32)
            ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
            gxH = jnp.dot(gt, repd_refs[l][...],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)                     # once per level
            first_tile = jnp.logical_and(j_chunk == 0, j == 0)
            if pstack:
                # P points stacked on the sublane axis (see the forward
                # kernel): ryx/a/dcx/dry become one dot each per level, and
                # the dV accumulation becomes a single K = P*tile contraction
                # instead of P K=tile dots + P VMEM accumulate round-trips.
                cxs, rys, hys, dxrows, dyrows, aws = [], [], [], [], [], []
                for pi in range(p):
                    x = x_ref[0, l, pi, pl.ds(q0, tile)] * w - 0.5
                    y = y_ref[0, l, pi, pl.ds(q0, tile)] * h - 0.5
                    aw = aw_ref[0, l, pi, pl.ds(q0, tile)]
                    cx, dxrow = hat_and_deriv(x, iw)
                    hy, dyrow = hat_and_deriv(y, ih)
                    cxs.append(cx)
                    rys.append(hy * aw[:, None])
                    hys.append(hy)
                    dxrows.append(dxrow)
                    dyrows.append(dyrow)
                    aws.append(aw)
                cx_s = jnp.concatenate(cxs, axis=0).astype(jnp.bfloat16)
                ry_s = jnp.concatenate(rys, axis=0).astype(jnp.bfloat16)
                gxH_s = jnp.concatenate([gxH] * p, axis=0)           # (P*tile, D*H)
                if ryx_mm:
                    ryx = jnp.dot(ry_s, rep_refs[l][...],
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
                else:
                    ryx = pltpu.repeat(ry_s, d, axis=1)
                a = jnp.dot(cx_s, value_refs[l][0],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                da = gxH_s * ryx                                     # (P*tile, D*H)

                dv_part = jax.lax.dot_general(
                    cx_s, da, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (W, D*H)

                @pl.when(first_tile)
                def _():
                    dv_refs[l][0] = dv_part

                @pl.when(jnp.logical_not(first_tile))
                def _():
                    dv_refs[l][0] = dv_refs[l][0] + dv_part

                dcx = jax.lax.dot_general(
                    da, value_refs[l][0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (P*tile, W)
                dry = jax.lax.dot_general(
                    gxH_s * a, rep_refs[l][...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (P*tile, H)
                for pi in range(p):
                    r0, r1 = pi * tile, (pi + 1) * tile
                    dx_ref[0, l, pi, pl.ds(q0, tile)] = (
                        (dcx[r0:r1] * dxrows[pi]).sum(axis=1) * w)
                    dry_p = dry[r0:r1]
                    daw_ref[0, l, pi, pl.ds(q0, tile)] = (
                        dry_p * hys[pi]).sum(axis=1)
                    dy_ref[0, l, pi, pl.ds(q0, tile)] = (
                        aws[pi] * (dry_p * dyrows[pi]).sum(axis=1) * h)
                continue
            for pi in range(p):
                x = x_ref[0, l, pi, pl.ds(q0, tile)] * w - 0.5
                y = y_ref[0, l, pi, pl.ds(q0, tile)] * h - 0.5
                aw = aw_ref[0, l, pi, pl.ds(q0, tile)]
                cx, dxrow = hat_and_deriv(x, iw)                     # (tile, W)
                hy, dyrow = hat_and_deriv(y, ih)                     # (tile, H)
                ry = (hy * aw[:, None]).astype(jnp.bfloat16)
                cx_b = cx.astype(jnp.bfloat16)

                if xk:
                    # Expansion-side derivative contractions: the production
                    # dcx/dry dots contract K = D*H_l into N = W_l/H_l output
                    # lanes (<= 80 of 128 — heavily lane-underutilized, and K
                    # = D*H_l streams 12 K-passes for level 0).  Flipped
                    # algebraically:
                    #   dx_q  = sum_k da[q,k]  * (dxrow @ V')[q,k]
                    #   dy_q  = aw * sum_k ga[q,k] * (dyrow @ REP)[q,k]
                    #   daw_q = sum_k ga[q,k] * (hy @ REP)[q,k]
                    # where ga = gxH * a.  The new dots (vx, dyx, hyx) have
                    # K = W_l/H_l (one MXU pass) and N = D*H_l (full lanes),
                    # reusing the resident V'/REP operands; hyx is shared
                    # with the ryx expansion (ryx = aw * hyx).  Row-sums move
                    # to the VPU over D*H_l lanes.  A/B knob — see PROFILE.md
                    # for the on-chip measurement.
                    hyx = jnp.dot(hy.astype(jnp.bfloat16), rep_refs[l][...],
                                  preferred_element_type=jnp.float32)  # (tile, D*H)
                    ryx = (hyx * aw[:, None]).astype(jnp.bfloat16)
                    a = jnp.dot(cx_b, value_refs[l][0],
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                    da = gxH * ryx

                    dv_part = jax.lax.dot_general(
                        cx_b, da, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)          # (W, D*H)

                    first = jnp.logical_and(first_tile, pi == 0)

                    @pl.when(first)
                    def _():
                        dv_refs[l][0] = dv_part

                    @pl.when(jnp.logical_not(first))
                    def _():
                        dv_refs[l][0] = dv_refs[l][0] + dv_part

                    vx = jnp.dot(dxrow.astype(jnp.bfloat16), value_refs[l][0],
                                 preferred_element_type=jnp.float32)  # (tile, D*H)
                    dx_ref[0, l, pi, pl.ds(q0, tile)] = (
                        (da.astype(jnp.float32) * vx).sum(axis=1) * w)

                    dyx = jnp.dot(dyrow.astype(jnp.bfloat16), rep_refs[l][...],
                                  preferred_element_type=jnp.float32)  # (tile, D*H)
                    ga = (gxH * a).astype(jnp.float32)
                    daw_ref[0, l, pi, pl.ds(q0, tile)] = (ga * hyx).sum(axis=1)
                    dy_ref[0, l, pi, pl.ds(q0, tile)] = (
                        aw * (ga * dyx).sum(axis=1) * h)
                    continue

                if ryx_mm:
                    ryx = jnp.dot(ry, rep_refs[l][...],
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)
                else:
                    # lane tiling instead of a K=H_l MXU pass (see forward)
                    ryx = pltpu.repeat(ry, d, axis=1)
                a = jnp.dot(cx_b, value_refs[l][0],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
                da = gxH * ryx

                dv_part = jax.lax.dot_general(
                    cx_b, da, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (W, D*H)

                first = jnp.logical_and(first_tile, pi == 0)

                @pl.when(first)
                def _():
                    dv_refs[l][0] = dv_part

                @pl.when(jnp.logical_not(first))
                def _():
                    dv_refs[l][0] = dv_refs[l][0] + dv_part

                dcx = jax.lax.dot_general(
                    da, value_refs[l][0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (tile, W)
                # d/dx in pixel units; the caller's x is normalized, scale by W
                dx_ref[0, l, pi, pl.ds(q0, tile)] = (
                    (dcx * dxrow).sum(axis=1) * w)

                dry = jax.lax.dot_general(
                    gxH * a, rep_refs[l][...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (tile, H)
                daw_ref[0, l, pi, pl.ds(q0, tile)] = (dry * hy).sum(axis=1)
                dy_ref[0, l, pi, pl.ds(q0, tile)] = (
                    aw * (dry * dyrow).sum(axis=1) * h)
        return carry

    jax.lax.fori_loop(0, tiles_per_chunk, tile_body, 0)


@functools.partial(jax.jit, static_argnums=(1, 6, 7, 8, 9, 10, 11))
def ms_deform_attn_pallas_bwd_cm(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    x_cm: Array,                  # (N, M, L, P, Lq) normalized
    y_cm: Array,
    aw_cm: Array,
    grad_out: Array,              # (N, Lq, M*D) cotangent
    tile_q: int = 128,            # 128 measured ~10% faster than 256 (PROFILE.md)
    interpret: bool = False,
    ryx_mm: bool = True,          # see ms_deform_attn_pallas_cm
    # bit-identical, bwd 27.06 -> 22.34 ms/call (PROFILE.md round-6)
    hat_direct: bool = True,      # see ms_deform_attn_pallas_cm
    pstack: bool = False,         # see ms_deform_attn_pallas_cm
    # expansion-side derivative contractions (K = hat axis, N = D*H_l lanes)
    # for dx/dy/daw — see the kernel comment; A/B via bench variant cm_xk
    xk: bool = False,
):
    """Returns (d_value, d_x_cm, d_y_cm, d_aw_cm) — dq grads in CM layout."""
    assert not (pstack and xk), "pstack and xk are mutually exclusive A/B knobs"
    n, s, m, d = value.shape
    _, _, l, p, lq = x_cm.shape
    nm = n * m

    v_levels = _fold_value_levels(value, spatial_shapes)
    tile_q, pad, qtot, chunk, tiles_per_chunk = _cm_tiling(lq, tile_q)
    n_chunks = qtot // chunk

    def fold(a):
        a = a.astype(jnp.float32).reshape(nm, l, p, lq)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else a

    xf, yf, awf = fold(x_cm), fold(y_cm), fold(aw_cm)

    g = grad_out.astype(jnp.float32).reshape(n, lq, m, d).transpose(0, 2, 1, 3)
    g = g.reshape(nm, lq, d)
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))

    reps, _ = _constants(spatial_shapes, d)
    repds = [jnp.asarray(r, jnp.bfloat16) for r in _repd_np(spatial_shapes, d)]

    qspec = pl.BlockSpec((1, l, p, chunk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    vspecs = [pl.BlockSpec((1, w, d * h), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    rspecs = [pl.BlockSpec((h, d * h), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
              for (h, w) in spatial_shapes]
    rdspecs = [pl.BlockSpec((d, d * h), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
               for (h, w) in spatial_shapes]
    dv_specs = [pl.BlockSpec((1, w, d * h), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for (h, w) in spatial_shapes]
    dq_spec = pl.BlockSpec((1, l, p, chunk), lambda i, j: (i, 0, 0, j),
                           memory_space=pltpu.VMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct((nm, w, d * h), jnp.float32)
         for (h, w) in spatial_shapes]
        + [jax.ShapeDtypeStruct((nm, l, p, qtot), jnp.float32)] * 3
    )
    outs = pl.pallas_call(
        functools.partial(_msda_cm_bwd_kernel, spatial_shapes, d, p, tile_q,
                          tiles_per_chunk, ryx_mm, hat_direct, pstack, xk),
        out_shape=tuple(out_shapes),
        grid=(nm, n_chunks),
        in_specs=[qspec] * 3 + [gspec] + vspecs + rspecs + rdspecs,
        out_specs=tuple(dv_specs + [dq_spec] * 3),
        interpret=interpret,
    )(xf, yf, awf, g, *v_levels, *reps, *repds)
    dvs = outs[:l]
    dxg, dyg, dawg = outs[l:]

    dv_parts = []
    for (hh, ww), dv in zip(spatial_shapes, dvs):
        dv = dv.reshape(nm, ww, d, hh).transpose(0, 3, 1, 2)   # (NM, H, W, D)
        dv_parts.append(dv.reshape(nm, hh * ww, d))
    d_value = jnp.concatenate(dv_parts, axis=1).reshape(n, m, s, d)
    d_value = d_value.transpose(0, 2, 1, 3).astype(value.dtype)

    def unfold(a):  # (NM, L, P, QTOT) -> (N, M, L, P, Lq): reshape + slice only
        return a[:, :, :, :lq].reshape(n, m, l, p, lq)

    return (d_value, unfold(dxg).astype(x_cm.dtype),
            unfold(dyg).astype(y_cm.dtype), unfold(dawg).astype(aw_cm.dtype))


# --------------------------------------------------------------------------
# Multi-level fused-K formulation (PROFILE.md round-4 closing, the last
# named structural lever): concatenate the per-level hat rows on the lane
# axis and replace the L per-level stage dots with ONE block-diagonal dot
# per stage,
#     A_all   = [cx_0 | .. | cx_3] @ blockdiag(V'_l)     K = sum W_l = 150
#     RYX_all = [ry_0 | .. | ry_3] @ blockdiag(REP_l)    K = sum H_l = 90
# Pass-count analysis says this should LOSE: the separate level dots each
# pay one (K <= 80 < 128)-deep pass per ceil(D*H_l/128) lane tile
# (12+6+3+2 = 23 units/point/stage), while the fused dot pays
# ceil(150/128) = 2 passes across ALL ceil(sum D*H_l/128) = 23 lane tiles
# (46 units) — the block-diagonal zeros are not free on a systolic array.
# Built to close the claim with an on-chip measurement
# (scripts/bench_msda_kernel.py --variants cm fk); verdict in PROFILE.md.
# --------------------------------------------------------------------------


def _msda_cm_fk_kernel(levels, d, p, tile, tiles_per_chunk,
                       x_ref, y_ref, aw_ref, vb_ref, repb_ref, sel_ref,
                       out_ref):
    nl = len(levels)

    def tile_body(j, carry):
        q0 = pl.multiple_of(j * tile, tile)
        accp = None
        for pi in range(p):
            cxs, rys = [], []
            for l, (h, w) in enumerate(levels):
                iw = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1).astype(jnp.float32)
                ih = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1).astype(jnp.float32)
                x = x_ref[0, l, pi, pl.ds(q0, tile)] * w - 0.5
                y = y_ref[0, l, pi, pl.ds(q0, tile)] * h - 0.5
                aw = aw_ref[0, l, pi, pl.ds(q0, tile)]
                cxs.append(_hat_direct(x, iw))
                rys.append(_hat_direct(y, ih) * aw[:, None])
            cx_all = jnp.concatenate(cxs, axis=1).astype(jnp.bfloat16)  # (tile, sum W)
            ry_all = jnp.concatenate(rys, axis=1).astype(jnp.bfloat16)  # (tile, sum H)
            a = jnp.dot(cx_all, vb_ref[0],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)                          # (tile, sum D*H)
            ryx = jnp.dot(ry_all, repb_ref[...],
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
            prod = (a * ryx).astype(jnp.float32)
            accp = prod if accp is None else accp + prod
        out = jnp.dot(accp.astype(jnp.bfloat16), sel_ref[...],
                      preferred_element_type=jnp.float32)               # (tile, L*D)
        acc = out[:, :d]
        for l in range(1, nl):
            acc = acc + out[:, l * d:(l + 1) * d]
        out_ref[0, pl.ds(q0, tile), :] = acc
        return carry

    jax.lax.fori_loop(0, tiles_per_chunk, tile_body, 0)


@functools.lru_cache(maxsize=None)
def _repb_np(spatial_shapes: Shapes, d: int):
    """Block-diagonal (sum H_l, sum D*H_l) replicator."""
    import numpy as np

    reps, _ = _constants_np(spatial_shapes, d)
    hs = [r.shape[0] for r in reps]
    dhs = [r.shape[1] for r in reps]
    out = np.zeros((sum(hs), sum(dhs)), bool)
    r0 = c0 = 0
    for r in reps:
        out[r0:r0 + r.shape[0], c0:c0 + r.shape[1]] = r
        r0 += r.shape[0]
        c0 += r.shape[1]
    return out


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def ms_deform_attn_pallas_cm_fk(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    x_cm: Array,                  # (N, M, L, P, Lq) normalized [0, 1]
    y_cm: Array,
    aw_cm: Array,
    tile_q: int = 512,
    interpret: bool = False,
) -> Array:                       # (N, Lq, M * D)
    n, s, m, d = value.shape
    _, _, l, p, lq = x_cm.shape
    nm = n * m

    # block-diagonal value operand (NM, sum W_l, sum D*H_l)
    v_levels = _fold_value_levels(value, spatial_shapes)
    dhs = [d * h for (h, w) in spatial_shapes]
    dh_sum = sum(dhs)
    vb_parts = []
    c0 = 0
    for v, dh in zip(v_levels, dhs):
        vb_parts.append(jnp.pad(v, ((0, 0), (0, 0), (c0, dh_sum - c0 - dh))))
        c0 += dh
    vb = jnp.concatenate(vb_parts, axis=1)          # (NM, sum W, sum D*H)

    tile_q, pad, qtot, chunk, tiles_per_chunk = _cm_tiling(lq, tile_q)
    n_chunks = qtot // chunk

    def fold(a):
        a = a.astype(jnp.float32).reshape(nm, l, p, lq)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else a

    xf, yf, awf = fold(x_cm), fold(y_cm), fold(aw_cm)
    repb = jnp.asarray(_repb_np(spatial_shapes, d), jnp.bfloat16)
    _, sel = _constants(spatial_shapes, d)
    wsum = vb.shape[1]
    hsum = repb.shape[0]

    qspec = pl.BlockSpec((1, l, p, chunk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    vbspec = pl.BlockSpec((1, wsum, dh_sum), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    rbspec = pl.BlockSpec((hsum, dh_sum), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((dh_sum, l * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_msda_cm_fk_kernel, spatial_shapes, d, p, tile_q,
                          tiles_per_chunk),
        out_shape=jax.ShapeDtypeStruct((nm, qtot, d), jnp.float32),
        grid=(nm, n_chunks),
        in_specs=[qspec] * 3 + [vbspec, rbspec, sspec],
        out_specs=pl.BlockSpec((1, chunk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, yf, awf, vb, repb, sel)

    out = out[:, :lq]
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(
        n, lq, m * d).astype(value.dtype)
