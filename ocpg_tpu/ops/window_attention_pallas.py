"""Fused (shifted-)window attention for the Swin backbones — Pallas TPU.

** Measured NEGATIVE result — kept in-tree with tests as the documented
** A/B knob (`swin_attn_impl='pallas'`); production uses the XLA path.

Reference behavior: /root/reference/models/video_swin_transformer.py:87-169
(WindowAttention3D: qk^T + relative-position bias [+ SW-MSA mask] -> softmax
-> @v).  Hypothesis: the XLA lowering (window_attention_xla below, the exact
math the module uses) materializes the (B_windows, heads, N, N) logits in
HBM — the backbone's largest HBM tenant (PROFILE.md round-5: bf16-storing
that buffer alone was worth 150.8 -> 173.1 f/s) — and the window length N is
tiny (<= 8*7*7 = 392), so computing softmax(q @ k^T + bias + mask) @ v per
(window, head-group) entirely in VMEM should win.

Measured on v5e (PROFILE.md "fused window attention"): the kernel LOSES 2x
at stage-3 shapes (0.320 vs 0.157 ms/block) and ties at stage-1 (1.175 vs
1.141).  Once logits are bf16-stored, window attention is MXU-row-bound,
not HBM-bound: matmul time goes as M * ceil(K/128) * ceil(N/128) row-steps,
which is IDENTICAL for the fused per-head dots and XLA's batched einsum
(K=dh=32 fills only a quarter of the MXU depth either way, and block-diag
head packing does not reduce row-steps) — but XLA schedules the batched
matmul across MXUs where Mosaic's sequential small dots cannot.  The HBM
traffic the kernel saves was not the binding constraint.

Layout notes that made the kernel compile (useful precedent): heads must
stay packed in the 128-lane channel dim — a standalone head axis is either
lane-padded 4x (dh=32 -> 128) or, as a sublane-tiled dim, cannot be
dynamically indexed; and the per-window loop must be a fori_loop, because
python-unrolled bodies each keep their (N, N) f32 scratch live on the
16 MB scoped-vmem stack.

Gradients: `window_attention` wraps the kernel in a custom_vjp whose
backward differentiates the XLA formulation (recompute).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (kept for parity with sibling kernels)

Array = jax.Array

_NEG = -1e9


def window_attention_xla(q: Array, k: Array, v: Array, bias: Array,
                         mask: Optional[Array], dtype: jnp.dtype) -> Array:
    """The module's original XLA math, verbatim (backbone_video_swin.py).

    q (pre-scaled), k, v: (bw, n, h, dh);  bias: (h, n, n);
    mask: (nw, n, n) or None.  Returns (bw, n, h, dh).
    Logits are stored in `dtype` (bf16 in production — HBM traffic), softmax
    runs in f32 — the reference's AMP semantics.
    """
    bw, n, h, dh = q.shape
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32).astype(dtype)
    attn = attn + bias[None].astype(dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, h, n, n) + jnp.asarray(mask, dtype)[None, :, None]
        attn = attn.reshape(bw, h, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_group(nwt: int, n_pad: int, lanes: int) -> int:
    """Windows per grid step: amortize grid-step overhead, stay under a
    conservative VMEM budget (4 MB of varying blocks; pallas double-buffers
    them).  Must divide the per-batch window count so the SW-MSA mask block
    index stays aligned."""
    per_window = 4 * n_pad * lanes * 2 + 2 * n_pad * n_pad  # qkv+out, mask (bf16)
    gmax = max(1, min(8, (4 * 1024 * 1024) // per_window))
    for g in range(gmax, 0, -1):
        if nwt % g == 0:
            return g
    return 1


def heads_per_group(h: int, dh: int) -> Optional[int]:
    """How many heads share one 128-lane block.

    The head axis must NOT be a standalone (sublane-tiled) array dim: dh=32
    would be lane-padded to 128 (4x VMEM waste) and dynamic head indexing on
    a tiled dim is not lowerable.  Instead heads stay packed in the channel
    lanes — q/k/v blocks are (g, N_pad, group*dh) lane slices of the
    (bw, N_pad, C) array, and the kernel statically slices each head's dh
    lanes.  Group lane width is min(C, 128) so block lane offsets stay
    128-aligned; returns None (caller falls back to XLA) for head widths
    that cannot tile 128 — never the case for the Swin family (dh = 32).
    """
    c = h * dh
    if c <= 128:
        return h
    if 128 % dh == 0 and h % (128 // dh) == 0:
        return 128 // dh
    return None


def _wattn_kernel(hg, dh, g, per_window_mask,
                  q_ref, k_ref, v_ref, b_ref, m_ref, o_ref):
    # outer fori_loop (not python unrolling) so the (N, N) f32 logits/exp
    # temporaries are reused across windows — an unrolled g*h loop kept
    # every instance live and blew the 16 MB scoped-vmem stack at stage-1
    # shapes.  The per-group head loop (<= 4) unrolls statically: head
    # slices are static lane offsets, which Mosaic requires.
    def window_body(gi, carry):
        m = (m_ref[gi] if per_window_mask else m_ref[0]).astype(jnp.float32)
        for hj in range(hg):
            s = hj * dh
            q = q_ref[gi, :, s:s + dh]
            k = k_ref[gi, :, s:s + dh]
            v = v_ref[gi, :, s:s + dh]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)                  # (N, N)
            logits = logits + b_ref[hj].astype(jnp.float32) + m
            mx = jnp.max(logits, axis=1, keepdims=True)
            e = jnp.exp(logits - mx)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(jnp.bfloat16)
            o_ref[gi, :, s:s + dh] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, g, window_body, 0)


@functools.partial(jax.jit, static_argnums=(5,))
def window_attention_fused(q: Array, k: Array, v: Array, bias: Array,
                           mask: Optional[Array], interpret: bool = False) -> Array:
    """softmax(q @ k^T + bias [+ mask]) @ v without HBM logits.

    q (pre-scaled by dh^-0.5), k, v: (bw, n, h, dh);  bias: (h, n, n);
    mask: (nw, n, n) additive SW-MSA mask (bw % nw == 0, window index varies
    fastest within bw) or None.  Returns (bw, n, h, dh) in q.dtype.
    Matmuls and the stored p run in bf16 (f32 accumulation + f32 softmax) —
    the production compute dtype; the XLA path is the fallback for CPU.
    """
    bw, n, h, dh = q.shape
    c = h * dh
    hg = heads_per_group(h, dh)
    assert hg is not None, "unsupported head width — dispatcher must fall back"
    n_pad = _round_up(n, 128)
    pad_n = n_pad - n

    def pad_q(a):
        a = a.reshape(bw, n, c).astype(jnp.bfloat16)  # heads packed in lanes
        return jnp.pad(a, ((0, 0), (0, pad_n), (0, 0))) if pad_n else a

    qp, kp, vp = pad_q(q), pad_q(k), pad_q(v)
    bp = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_n))).astype(jnp.bfloat16)

    # additive mask: SW-MSA blocks (per window) + padded-key columns
    if mask is not None:
        nwt = mask.shape[0]
        mp = jnp.pad(jnp.asarray(mask, jnp.float32),
                     ((0, 0), (0, pad_n), (0, pad_n)))
        per_window_mask = True
    else:
        nwt = bw  # no per-window structure: group freely across the batch
        mp = jnp.zeros((1, n_pad, n_pad), jnp.float32)
        per_window_mask = False
    if pad_n:
        mp = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pad), 2) >= n, _NEG, mp)
    mp = mp.astype(jnp.bfloat16)

    g = _pick_group(nwt, n_pad, hg * dh)
    grid = (bw // nwt, nwt // g, h // hg)  # head groups innermost: the mask
    #                                        block index stays constant there
    #                                        and is not re-fetched

    qspec = pl.BlockSpec((g, n_pad, hg * dh),
                         lambda i, j, kk, _steps=nwt // g: (i * _steps + j, 0, kk))
    bspec = pl.BlockSpec((hg, n_pad, n_pad), lambda i, j, kk: (kk, 0, 0))
    if per_window_mask:
        mspec = pl.BlockSpec((g, n_pad, n_pad), lambda i, j, kk: (j, 0, 0))
    else:
        mspec = pl.BlockSpec((1, n_pad, n_pad), lambda i, j, kk: (0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_wattn_kernel, hg, dh, g, per_window_mask),
        out_shape=jax.ShapeDtypeStruct((bw, n_pad, c), q.dtype),
        grid=grid,
        in_specs=[qspec, qspec, qspec, bspec, mspec],
        out_specs=qspec,
        interpret=interpret,
    )(qp, kp, vp, bp, mp)
    out = out[:, :n] if pad_n else out
    return out.reshape(bw, n, h, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def window_attention(q, k, v, bias, mask, dtype):
    """Fused forward + XLA-recompute backward (see module docstring)."""
    return window_attention_fused(q, k, v, bias, mask)


def _wattn_fwd(q, k, v, bias, mask, dtype):
    return window_attention(q, k, v, bias, mask, dtype), (q, k, v, bias, mask)


def _wattn_bwd(dtype, residuals, gout):
    q, k, v, bias, mask = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: window_attention_xla(q_, k_, v_, b_, mask, dtype),
        q, k, v, bias)
    return (*vjp(gout), None if mask is None else jnp.zeros_like(mask))


window_attention.defvjp(_wattn_fwd, _wattn_bwd)
