"""Fused window-attention kernel (interpret mode on CPU) vs the XLA path.

The XLA path (window_attention_xla) is itself pinned by the Video-Swin
torch-block golden parity test (tests/test_video_swin_parity.py), so
agreement here chains the fused kernel to the reference semantics
(/root/reference/models/video_swin_transformer.py:87-169)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocpg_tpu.ops.window_attention_pallas import (
    _wattn_bwd, window_attention_fused, window_attention_xla)


def _inputs(rng, bw=6, n=13, h=2, dh=8):
    q = jnp.asarray(rng.standard_normal((bw, n, h, dh)), jnp.float32) * 0.5
    k = jnp.asarray(rng.standard_normal((bw, n, h, dh)), jnp.float32) * 0.5
    v = jnp.asarray(rng.standard_normal((bw, n, h, dh)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32) * 0.1
    return q, k, v, bias


@pytest.mark.parametrize("n", [13, 128])
def test_fused_matches_xla_no_mask(rng, n):
    """Padding path (n=13 -> 128 padded keys masked to -1e9) and the exact
    lane-aligned path (n=128).  bf16 kernel internals -> bf16 tolerance."""
    q, k, v, bias = _inputs(rng, n=n)
    expected = window_attention_xla(q, k, v, bias, None, jnp.float32)
    got = window_attention_fused(q, k, v, bias, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_fused_matches_xla_multi_head_group(rng):
    """c = h*dh > 128: heads are processed in 128-lane groups (grid axis) —
    the production Swin shapes (dh=32, h in 4..32) all take this path."""
    q, k, v, bias = _inputs(rng, bw=4, n=49, h=8, dh=32)
    expected = window_attention_xla(q, k, v, bias, None, jnp.float32)
    got = window_attention_fused(q, k, v, bias, None, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_fused_matches_xla_per_window_mask(rng):
    """SW-MSA additive mask: bw = batch * nw, window index fastest; the mask
    block (-100 on cross-region pairs) must be applied per window."""
    bw, n, h, dh, nw = 6, 49, 2, 8, 3
    q, k, v, bias = _inputs(rng, bw=bw, n=n, h=h, dh=dh)
    mask = np.zeros((nw, n, n), np.float32)
    for w in range(nw):  # distinct block structure per window
        cut = 10 + 9 * w
        mask[w, :cut, cut:] = -100.0
        mask[w, cut:, :cut] = -100.0
    mask = jnp.asarray(mask)
    expected = window_attention_xla(q, k, v, bias, mask, jnp.float32)
    got = window_attention_fused(q, k, v, bias, mask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_custom_vjp_backward_matches_autodiff(rng):
    """The custom_vjp backward (XLA recompute) must equal plain autodiff of
    the XLA formulation — it IS the train path whenever the fused forward is
    selected."""
    q, k, v, bias = _inputs(rng, n=49)
    g = jnp.asarray(np.random.default_rng(3).standard_normal(q.shape),
                    jnp.float32)

    def loss(q_, k_, v_, b_):
        return (window_attention_xla(q_, k_, v_, b_, None, jnp.float32) * g).sum()

    ref = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    got = _wattn_bwd(jnp.float32, (q, k, v, bias, None), g)
    assert got[4] is None  # no mask cotangent
    for a, b in zip(got[:4], ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
