"""Experimental Pallas kernel for multi-scale deformable attention (forward).

Strategy: the bilinear corners and their combined weights
(bilinear_weight x attention_weight, zeroed outside the map) are computed
with cheap VPU math *outside* the kernel; the kernel then performs the hot
part — four weighted row-gathers per level from a VMEM-resident value block:

    out[q] = sum_c w[q, c] * value[idx[q, c]]

Grid: (N*M, query tiles).  The per-level value block (S_l, D) is pipelined
into VMEM by the BlockSpec machinery; gathers run against VMEM instead of
issuing N*M*Lq*P*4 separate HBM transactions, which is the theoretical win
over the XLA lowering when query tiles reuse the same value block.

Status: the in-kernel `jnp.take_along_axis` requires Mosaic's sublane-gather
lowering; on stacks without it the `interpret=True` path is still exact and
the public `ms_deform_attn` (ops/ms_deform_attn.py, canonical XLA batched
gather) remains the production op.  `pallas_available()` probes support.
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


def _gather_kernel(idx_ref, w_ref, value_ref, out_ref):
    # blocks: idx (1, TQ, 4) int32; w (1, TQ, 4) f32; value (1, S, D); out (1, TQ, D)
    value = value_ref[0]
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for c in range(4):
        idx = idx_ref[0, :, c]
        g = jnp.take_along_axis(value, idx[:, None], axis=0)  # (TQ, D)
        acc = acc + w_ref[0, :, c][:, None] * g.astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _corners_and_weights(loc_x, loc_y, attn, height, width):
    """Four (idx, weight) pairs per sample; weight folds bilinear x attention
    and zeroes out-of-bounds corners (grid_sample zero padding)."""
    x = loc_x * width - 0.5
    y = loc_y * height - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx, dy = x - x0, y - y0
    idxs, ws = [], []
    for cx, cy, cw in (
        (x0, y0, (1 - dx) * (1 - dy)),
        (x0 + 1, y0, dx * (1 - dy)),
        (x0, y0 + 1, (1 - dx) * dy),
        (x0 + 1, y0 + 1, dx * dy),
    ):
        valid = (cx >= 0) & (cx <= width - 1) & (cy >= 0) & (cy <= height - 1)
        flat = (jnp.clip(cy, 0, height - 1) * width + jnp.clip(cx, 0, width - 1)).astype(jnp.int32)
        idxs.append(flat)
        ws.append(jnp.where(valid, cw, 0.0) * attn)
    return jnp.stack(idxs, -1), jnp.stack(ws, -1)     # (..., 4) each


def _level_pallas(value_l: Array, idx: Array, w: Array, tile_q: int,
                  interpret: bool) -> Array:
    """value_l: (NM, S, D); idx/w: (NM, LQP, 4) -> (NM, LQP, D)."""
    nm, s, d = value_l.shape
    lqp = idx.shape[1]
    pad = (-lqp) % tile_q
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
    n_tiles = (lqp + pad) // tile_q

    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((nm, lqp + pad, d), value_l.dtype),
        grid=(nm, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_q, 4), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile_q, 4), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(idx, w.astype(jnp.float32), value_l)
    return out[:, :lqp]


@functools.partial(jax.jit, static_argnums=(1, 4, 5))
def ms_deform_attn_pallas(
    value: Array,                 # (N, S, M, D)
    spatial_shapes: Shapes,
    sampling_locations: Array,    # (N, Lq, M, L, P, 2)
    attention_weights: Array,     # (N, Lq, M, L, P)
    tile_q: int = 512,
    interpret: bool = False,
) -> Array:
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    value_nm = value.transpose(0, 2, 1, 3).reshape(n * m, s, d)

    out = jnp.zeros((n * m, lq * p, d), jnp.float32)
    start = 0
    for lid, (h, w_) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value_nm, start, h * w_, axis=1)
        loc = sampling_locations[:, :, :, lid].astype(jnp.float32)
        aw = attention_weights[:, :, :, lid].astype(jnp.float32)
        # (N, Lq, M, P) -> (N*M, Lq*P)
        lx = loc[..., 0].transpose(0, 2, 1, 3).reshape(n * m, lq * p)
        ly = loc[..., 1].transpose(0, 2, 1, 3).reshape(n * m, lq * p)
        a = aw.transpose(0, 2, 1, 3).reshape(n * m, lq * p)
        idx, w = _corners_and_weights(lx, ly, a, h, w_)
        out = out + _level_pallas(value_l.astype(jnp.float32), idx, w, tile_q, interpret)
        start += h * w_

    out = out.reshape(n, m, lq, p, d).sum(axis=3)       # reduce points
    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d).astype(value.dtype)


def pallas_available() -> bool:
    """Probe whether Mosaic can compile the gather kernel on this backend."""
    try:
        import numpy as np

        v = jnp.asarray(np.random.rand(1, 16, 4, 8), jnp.float32)
        locs = jnp.asarray(np.random.rand(1, 2, 4, 1, 2, 2), jnp.float32)
        attn = jnp.ones((1, 2, 4, 1, 2), jnp.float32) / 2
        ms_deform_attn_pallas(v, ((4, 4),), locs, attn, 8, False).block_until_ready()
        return True
    except Exception:
        return False
