"""Multi-scale deformable attention — XLA-native gather formulation.

Functional equivalent of the reference CUDA kernel pair
(`/root/reference/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299` forward,
`:301-921` backward) and of the pure-PyTorch oracle
(`/root/reference/models/ops/functions/ms_deform_attn_func.py:41-61`,
`F.grid_sample(..., mode='bilinear', padding_mode='zeros', align_corners=False)`).

TPU design notes
----------------
* The CUDA kernel parallelises one thread per (batch, query, head, channel) and
  performs a scalar bilinear gather per sampling point.  On TPU we express the
  same computation as four `jnp.take_along_axis` gathers per level (one per
  bilinear corner) over the flattened H*W axis, followed by a weighted
  reduction on the VPU.  XLA lowers these to hardware gathers and fuses the
  arithmetic; gradients (scatter-adds for grad_value, product-rule terms for
  locations/weights) come from autodiff, removing the need for the five
  hand-written backward kernel variants in the reference.
* `spatial_shapes` is a *static* Python tuple, unlike the reference which
  carries it as a device tensor (`deformable_transformer.py:167`).  Static
  shapes let XLA unroll the per-level loop and tile each gather; the model
  compiles once per input-resolution bucket.
* The `im2col_step` batch-chunking knob of the CUDA wrapper
  (`ms_deform_attn_cuda.cu:20-80`) is a GPU memory workaround and is dropped;
  consequently the reference's 36-frame inference cap does not exist here.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _sample_one_level(
    value_l: Array,          # (N*M, H*W, D) — heads folded into batch
    height: int,
    width: int,
    loc: Array,              # (N, Lq, M, P, 2)  normalized [0, 1] (x, y)
) -> Array:                  # (N, Lq, M, P, D)
    """Bilinear sampling with grid_sample(align_corners=False, padding=zeros) semantics.

    The gather operand is laid out (batch=N*M, gather_axis=S, minor=D): a
    canonical batched row gather that XLA lowers to vectorized dynamic
    gathers on TPU.  (A layout with the head axis *between* S and D lowers to
    a scalar loop — catastrophically slow.)
    """
    n, lq, m, p, _ = loc.shape
    d = value_l.shape[-1]
    compute_dtype = value_l.dtype

    # pixel coordinates: x = loc_x * W - 0.5  (align_corners=False)
    x = loc[..., 0].astype(jnp.float32) * width - 0.5
    y = loc[..., 1].astype(jnp.float32) * height - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)
    dy = (y - y0)

    out = jnp.zeros((n, lq, m, p, d), dtype=jnp.float32)
    # four bilinear corners: (corner_x, corner_y, weight)
    corners = (
        (x0, y0, (1.0 - dx) * (1.0 - dy)),
        (x0 + 1.0, y0, dx * (1.0 - dy)),
        (x0, y0 + 1.0, (1.0 - dx) * dy),
        (x0 + 1.0, y0 + 1.0, dx * dy),
    )
    for cx, cy, cw in corners:
        valid = (cx >= 0) & (cx <= width - 1) & (cy >= 0) & (cy <= height - 1)
        ix = jnp.clip(cx, 0, width - 1).astype(jnp.int32)
        iy = jnp.clip(cy, 0, height - 1).astype(jnp.int32)
        flat = iy * width + ix                              # (N, Lq, M, P)
        # (N, Lq, M, P) -> (N*M, Lq*P): fold heads into batch, points into rows
        flat = jnp.transpose(flat, (0, 2, 1, 3)).reshape(n * m, lq * p)
        g = jnp.take_along_axis(value_l, flat[..., None], axis=1)  # (N*M, Lq*P, D)
        g = g.reshape(n, m, lq, p, d).transpose(0, 2, 1, 3, 4)     # (N, Lq, M, P, D)
        w = jnp.where(valid, cw, 0.0)
        out = out + w[..., None] * g.astype(jnp.float32)
    return out.astype(compute_dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn(
    value: Array,                                # (N, S, M, D), S = sum_l H_l*W_l
    spatial_shapes: Tuple[Tuple[int, int], ...], # static ((H0, W0), ...)
    sampling_locations: Array,                   # (N, Lq, M, L, P, 2) in [0, 1]
    attention_weights: Array,                    # (N, Lq, M, L, P)
) -> Array:                                      # (N, Lq, M * D)
    """Multi-scale deformable attention core op.

    Matches `ms_deform_attn_core_pytorch` (`ms_deform_attn_func.py:41-61`) and
    the CUDA kernel bit-for-bit up to float associativity.
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    assert l == len(spatial_shapes), (l, spatial_shapes)
    assert s == sum(h * w for h, w in spatial_shapes), (s, spatial_shapes)

    # (N, S, M, D) -> (N*M, S, D): heads folded into the gather batch
    value_nm = value.transpose(0, 2, 1, 3).reshape(n * m, s, d)

    level_start = 0
    out = jnp.zeros((n, lq, m, d), dtype=jnp.float32)
    for lid, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value_nm, level_start, h * w, axis=1)
        sampled = _sample_one_level(value_l, h, w, sampling_locations[:, :, :, lid])
        aw = attention_weights[:, :, :, lid].astype(jnp.float32)   # (N, Lq, M, P)
        out = out + jnp.einsum("nqmpd,nqmp->nqmd", sampled.astype(jnp.float32), aw)
        level_start += h * w
    return out.reshape(n, lq, m * d).astype(value.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def ms_deform_attn_separable(
    value: Array,                                # (N, S, M, D)
    spatial_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: Array,                   # (N, Lq, M, L, P, 2)
    attention_weights: Array,                    # (N, Lq, M, L, P)
) -> Array:                                      # (N, Lq, M * D)
    """Gather-free MSDA: bilinear sampling as separable hat-matrix matmuls.

    out[q, d] = sum_w cx[q, w] * sum_h (ry * attn)[q, h] * V[h, w, d]

    cx / ry are dense rows with two non-zeros (the bilinear corner weights,
    zero outside the map — grid_sample 'zeros' padding).  Rides the MXU
    instead of gather hardware: 3.3x faster than the gather formulation on
    TPU v5e at bench shapes (PROFILE.md), and its autodiff backward is the
    gradient path for the Pallas forward kernel (ms_deform_attn_pallas.py).
    Functionally identical to the CUDA kernel
    (/root/reference/models/ops/src/cuda/ms_deform_im2col_cuda.cuh:237-299).
    """
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    nm, lqp = n * m, lq * p
    value_nm = value.transpose(0, 2, 1, 3).reshape(nm, s, d)

    out = jnp.zeros((nm, lq, d), jnp.float32)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value_nm, start, h * w, axis=1)
        v_whd = v.reshape(nm, h, w, d).transpose(0, 2, 1, 3).reshape(nm, w, h * d)
        loc = sampling_locations[:, :, :, lid].astype(jnp.float32)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        aw = attention_weights[:, :, :, lid].astype(jnp.float32)

        def fold(a):  # (N, Lq, M, P) -> (NM, LQP)
            return a.transpose(0, 2, 1, 3).reshape(nm, lqp)

        def hat(center, frac, k):
            grid = jnp.arange(k, dtype=jnp.float32)
            c = center[..., None]
            f = frac[..., None]
            return (jnp.maximum(0.0, 1.0 - jnp.abs(c - grid)) * (1.0 - f)
                    + jnp.maximum(0.0, 1.0 - jnp.abs(c + 1.0 - grid)) * f)

        cx = hat(fold(x0), fold(x - x0), w)                       # (NM, LQP, W)
        ry = hat(fold(y0), fold(y - y0), h) * fold(aw)[..., None]  # (NM, LQP, H)
        mm_dtype = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32
        # note: keeping the (NM, LQP, H*D) intermediate in f32 measured FASTER
        # end-to-end than a bf16 round-trip (the cast breaks XLA's backward
        # fusions); the Pallas twin avoids the buffer entirely
        a = jnp.einsum("bqw,bwk->bqk", cx.astype(mm_dtype), v_whd.astype(mm_dtype),
                       preferred_element_type=jnp.float32)         # (NM, LQP, H*D)
        a = a.reshape(nm, lqp, h, d)
        o = jnp.einsum("bqhd,bqh->bqd", a, ry)                     # (NM, LQP, D)
        out = out + o.reshape(nm, lq, p, d).sum(axis=2)
        start += h * w
    return (out.reshape(n, m, lq, d).transpose(0, 2, 1, 3)
            .reshape(n, lq, m * d).astype(value.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_fast(value, spatial_shapes, sampling_locations,
                        attention_weights, impl: str = "xla"):
    """MSDA with a selectable forward implementation and a shared backward.

    impl: 'pallas' -> Pallas TPU kernel forward (ms_deform_attn_pallas.py);
          'separable' -> XLA matmul formulation; 'xla' -> batched gathers.
    The backward always differentiates the XLA separable formulation, which
    replaces the reference's five hand-written col2im CUDA kernel variants
    (ms_deform_im2col_cuda.cuh:301-921) with autodiff.
    """
    if impl == "pallas":
        from .ms_deform_attn_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                                     attention_weights)
    if impl == "separable":
        return ms_deform_attn_separable(value, spatial_shapes,
                                        sampling_locations, attention_weights)
    return ms_deform_attn(value, spatial_shapes, sampling_locations,
                          attention_weights)


def _msda_fast_fwd(value, spatial_shapes, sampling_locations,
                   attention_weights, impl):
    out = ms_deform_attn_fast(value, spatial_shapes, sampling_locations,
                              attention_weights, impl)
    return out, (value, sampling_locations, attention_weights)


def _msda_fast_bwd(spatial_shapes, impl, residuals, g):
    value, sampling_locations, attention_weights = residuals
    if impl == "pallas":
        from .ms_deform_attn_pallas import ms_deform_attn_pallas_bwd

        return ms_deform_attn_pallas_bwd(
            value, spatial_shapes, sampling_locations, attention_weights, g)
    _, vjp = jax.vjp(
        lambda v, sl, aw: ms_deform_attn_separable(v, spatial_shapes, sl, aw),
        value, sampling_locations, attention_weights)
    return vjp(g)


ms_deform_attn_fast.defvjp(_msda_fast_fwd, _msda_fast_bwd)


def ms_deform_attn_reference(
    value,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations,
    attention_weights,
):
    """Slow numpy-level oracle (no jit) mirroring the PyTorch debug oracle.

    Used only by tests to validate `ms_deform_attn` against an independent
    formulation (per-pixel python bilinear), see
    `/root/reference/models/ops/test.py:31-60` for the reference's analogue.
    """
    import numpy as np

    value = np.asarray(value, dtype=np.float64)
    locs = np.asarray(sampling_locations, dtype=np.float64)
    attn = np.asarray(attention_weights, dtype=np.float64)
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = locs.shape

    starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]
    out = np.zeros((n, lq, m, d))
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lid]:starts[lid] + h * w].reshape(n, h, w, m, d)
        x = locs[:, :, :, lid, :, 0] * w - 0.5
        y = locs[:, :, :, lid, :, 1] * h - 0.5
        x0 = np.floor(x).astype(np.int64)
        y0 = np.floor(y).astype(np.int64)
        dx, dy = x - x0, y - y0
        for (cx, cy, cw) in ((x0, y0, (1 - dx) * (1 - dy)),
                             (x0 + 1, y0, dx * (1 - dy)),
                             (x0, y0 + 1, (1 - dx) * dy),
                             (x0 + 1, y0 + 1, dx * dy)):
            valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            ixc = np.clip(cx, 0, w - 1)
            iyc = np.clip(cy, 0, h - 1)
            for ni in range(n):
                for mi in range(m):
                    g = v[ni, iyc[ni, :, mi], ixc[ni, :, mi], mi]   # (Lq, P, D)
                    wgt = (cw * valid)[ni, :, mi] * attn[ni, :, mi, lid]
                    out[ni, :, mi] += (wgt[..., None] * g).sum(axis=1)
    return out.reshape(n, lq, m * d)


# --------------------------------------------------------------------------
# Channel-major (CM) entry point: query params as (N, M, L, P, Lq).
#
# The model produces this layout with one cheap 2D transpose of its Dense
# outputs (deformable_transformer.py:MSDeformAttnModule); the Pallas CM
# kernels consume/produce it directly, eliminating the 5D fold/unfold
# transposes of the row-folded path and running the selector matmul once per
# query instead of once per (query, point) — see PROFILE.md round-3 notes.
# --------------------------------------------------------------------------


def _cm_to_standard(x_cm, y_cm, aw_cm):
    """(N, M, L, P, Lq) x/y/aw -> standard (N, Lq, M, L, P[, 2]) locs, attn."""
    locs = jnp.stack([x_cm, y_cm], axis=-1)              # (N, M, L, P, Lq, 2)
    locs = locs.transpose(0, 4, 1, 2, 3, 5)              # (N, Lq, M, L, P, 2)
    attn = jnp.transpose(aw_cm, (0, 4, 1, 2, 3))         # (N, Lq, M, L, P)
    return locs, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def ms_deform_attn_fast_cm(value, spatial_shapes, x_cm, y_cm, aw_cm,
                           impl: str = "xla"):
    """MSDA with channel-major query params (N, M, L, P, Lq), normalized [0,1].

    impl 'pallas' runs the CM Pallas kernel pair natively; 'separable'/'xla'
    convert to the standard layout first (CPU/test paths).  Returns
    (N, Lq, M*D).
    """
    if impl.startswith("pallas"):
        from .ms_deform_attn_pallas import ms_deform_attn_pallas_cm

        n, _, m, d = value.shape
        _, _, _, p, lq = x_cm.shape
        _record_msda_flops("fwd", msda_pallas_fwd_flops(
            spatial_shapes, n, m, d, p, lq))
        base, hd, ps, _xk = _parse_pallas_impl(impl)  # xk is backward-only
        return ms_deform_attn_pallas_cm(value, spatial_shapes, x_cm, y_cm, aw_cm,
                                        ryx_mm=(base == "pallas"),
                                        hat_direct=hd, pstack=ps)
    locs, attn = _cm_to_standard(x_cm, y_cm, aw_cm)
    if impl == "separable":
        return ms_deform_attn_separable(value, spatial_shapes, locs, attn)
    return ms_deform_attn(value, spatial_shapes, locs, attn)


def _msda_cm_fwd(value, spatial_shapes, x_cm, y_cm, aw_cm, impl):
    out = ms_deform_attn_fast_cm(value, spatial_shapes, x_cm, y_cm, aw_cm, impl)
    return out, (value, x_cm, y_cm, aw_cm)


def _parse_pallas_impl(impl: str):
    """'pallas[_rep][_hc][_ps|_xk]' -> (base impl, hat_direct, pstack, xk).

    Production defaults: direct relu(1-|x-g|) hat rows (PROFILE.md round-6),
    sequential per-point dots.  '_ps' selects the P-stacked dot form
    (bit-identical; measured NEUTRAL on-chip — PROFILE.md round-8), '_hc'
    the legacy floor/frac corner hats, '_xk' the expansion-side derivative
    contractions in the backward (forward unchanged).  All suffixes are A/B
    knobs for scripts/bench_msda_kernel.py."""
    pstack = xk = False
    if impl.endswith("_ps"):
        impl, pstack = impl[:-3], True
    elif impl.endswith("_sq"):
        impl, pstack = impl[:-3], False
    elif impl.endswith("_xk"):
        impl, xk = impl[:-3], True
    hc = impl.endswith("_hc")
    return (impl[:-3] if hc else impl), not hc, pstack, xk


def _msda_cm_bwd(spatial_shapes, impl, residuals, g):
    value, x_cm, y_cm, aw_cm = residuals
    if impl.startswith("pallas"):
        from .ms_deform_attn_pallas import ms_deform_attn_pallas_bwd_cm

        n, _, m, d = value.shape
        _, _, _, p, lq = x_cm.shape
        _record_msda_flops("bwd", msda_pallas_bwd_flops(
            spatial_shapes, n, m, d, p, lq))
        base, hd, ps, xk = _parse_pallas_impl(impl)
        return ms_deform_attn_pallas_bwd_cm(
            value, spatial_shapes, x_cm, y_cm, aw_cm, g,
            ryx_mm=(base == "pallas"), hat_direct=hd, pstack=ps, xk=xk)

    def f(v, x, y, a):
        locs, attn = _cm_to_standard(x, y, a)
        return ms_deform_attn_separable(v, spatial_shapes, locs, attn)

    _, vjp = jax.vjp(f, value, x_cm, y_cm, aw_cm)
    return vjp(g)


ms_deform_attn_fast_cm.defvjp(_msda_cm_fwd, _msda_cm_bwd)


# ---------------------------------------------------------------------------
# Analytic executed-FLOP accounting for the Pallas custom calls.
#
# XLA's cost analysis counts a Pallas custom call as ZERO flops, so any MFU
# computed from HLO flops understates hardware utilization by exactly the
# kernels' share of the step (~66% at train shapes, PROFILE.md round-15).
# The hat-matmul algebra makes the kernels' executed MXU work a closed form
# in the static shapes; tracing a jitted program under `count_msda_flops()`
# records it per call, so bench.py can report kernel-inclusive MFU
# (VERDICT r4 next-step 3).
#
# These are EXECUTED-work numbers, not algorithmic-work numbers: the hat rows
# are structurally sparse (two non-zeros per row) but the MXU multiplies the
# dense row, and that dense volume is what the hardware spends cycles on.
# Counting is trace-time and exact here because every MSDA call site is a
# Python-level loop (encoder/decoder layers unroll — no lax.scan over
# layers), and remat replays re-trace the forward, so each appended entry
# corresponds to exactly one kernel execution per step.
# ---------------------------------------------------------------------------

_MSDA_FLOPS: list | None = None


@contextlib.contextmanager
def count_msda_flops():
    """Collect analytic (direction, flops) entries for every Pallas MSDA call
    traced inside the context.  Yields the list; sum the second elements."""
    global _MSDA_FLOPS
    prev, _MSDA_FLOPS = _MSDA_FLOPS, []
    try:
        yield _MSDA_FLOPS
    finally:
        _MSDA_FLOPS = prev


def _record_msda_flops(direction: str, flops: float) -> None:
    if _MSDA_FLOPS is not None:
        _MSDA_FLOPS.append((direction, flops))


def msda_pallas_fwd_flops(spatial_shapes, n, m, d, p, lq, tile_q=512):
    """Executed MXU+VPU flops of one `ms_deform_attn_pallas_cm` call.

    Per padded query row (qtot rows after tile padding, per NM grid cell),
    per level l: P x (cx@V' 2*W*D*H + ry@REP 2*H*D*H + a*ryx 2*D*H), then the
    SEL contraction 2*sumDH*(L*D) once (P-sum precedes SEL in the CM kernel).
    """
    from .ms_deform_attn_pallas import _cm_tiling

    _, _, qtot, _, _ = _cm_tiling(lq, tile_q)
    nl = len(spatial_shapes)
    sum_dh = sum(d * h for h, _ in spatial_shapes)
    per_row = 2.0 * sum_dh * (nl * d)
    for h, w in spatial_shapes:
        per_row += p * (2.0 * w * d * h + 2.0 * h * d * h + 2.0 * d * h)
    return float(n * m) * qtot * per_row


def msda_pallas_bwd_flops(spatial_shapes, n, m, d, p, lq, tile_q=128):
    """Executed flops of one `ms_deform_attn_pallas_bwd_cm` call (default
    variant): per level gxH (2*D*D*H once), then per point the five dots
    (ryx, a, dV-accumulate, dcx, dry) plus the elementwise da/row-sum work."""
    from .ms_deform_attn_pallas import _cm_tiling

    _, _, qtot, _, _ = _cm_tiling(lq, tile_q)
    per_row = 0.0
    for h, w in spatial_shapes:
        per_row += 2.0 * d * (d * h)
        per_row += p * (2.0 * h * d * h      # ryx = ry @ REP
                        + 2.0 * w * d * h    # a = cx @ V'
                        + 2.0 * w * d * h    # dV += cx^T @ da
                        + 2.0 * w * d * h    # dcx = da @ V'^T
                        + 2.0 * h * d * h    # dry = (gxH*a) @ REP^T
                        + 6.0 * d * h)       # da, products, row-sums
    return float(n * m) * qtot * per_row
