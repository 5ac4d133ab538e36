"""Parity tests for the deformable-attention core op.

Mirrors the reference's numerical-check matrix (`/root/reference/models/ops/test.py`):
forward equality vs the grid_sample oracle in float/double, plus gradient
checks via finite differences (the reference uses torch.autograd.gradcheck).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocpg_tpu.ops import ms_deform_attn, ms_deform_attn_reference

SHAPES = ((6, 4), (3, 2))
N, M, D = 1, 2, 8
LQ, P = 2, 2
S = sum(h * w for h, w in SHAPES)


def _rand_inputs(rng, n=N, lq=LQ, m=M, d=D, p=P, shapes=SHAPES):
    s = sum(h * w for h, w in shapes)
    value = rng.random((n, s, m, d)) * 0.01
    locs = rng.random((n, lq, m, len(shapes), p, 2))
    attn = rng.random((n, lq, m, len(shapes), p)) + 1e-5
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, locs, attn


def _torch_oracle(value, shapes, locs, attn):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    value = torch.from_numpy(np.asarray(value))
    locs = torch.from_numpy(np.asarray(locs))
    attn = torch.from_numpy(np.asarray(attn))
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = locs.shape
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    attn_t = attn.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attn_t).sum(-1).view(n, m * d, lq)
    return out.transpose(1, 2).contiguous().numpy()


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_forward_matches_torch_grid_sample(rng, dtype):
    value, locs, attn = _rand_inputs(rng)
    expected = _torch_oracle(value.astype(dtype), SHAPES, locs.astype(dtype), attn.astype(dtype))
    got = ms_deform_attn(
        jnp.asarray(value, dtype=jnp.float32),
        SHAPES,
        jnp.asarray(locs, dtype=jnp.float32),
        jnp.asarray(attn, dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_forward_matches_numpy_reference(rng):
    value, locs, attn = _rand_inputs(rng)
    expected = ms_deform_attn_reference(value, SHAPES, locs, attn)
    got = ms_deform_attn(
        jnp.asarray(value, dtype=jnp.float32),
        SHAPES,
        jnp.asarray(locs, dtype=jnp.float32),
        jnp.asarray(attn, dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_out_of_bounds_sampling_is_zero_padded(rng):
    value, locs, attn = _rand_inputs(rng)
    locs = locs * 4.0 - 2.0  # push most samples far outside [0, 1]
    expected = _torch_oracle(value, SHAPES, locs, attn)
    got = ms_deform_attn(
        jnp.asarray(value, dtype=jnp.float32),
        SHAPES,
        jnp.asarray(locs, dtype=jnp.float32),
        jnp.asarray(attn, dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("channels", [8, 32, 64, 71])
def test_channel_sizes(rng, channels):
    value, locs, attn = _rand_inputs(rng, d=channels)
    expected = _torch_oracle(value, SHAPES, locs, attn)
    got = ms_deform_attn(
        jnp.asarray(value, dtype=jnp.float32),
        SHAPES,
        jnp.asarray(locs, dtype=jnp.float32),
        jnp.asarray(attn, dtype=jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_gradients_match_finite_differences(rng):
    value, locs, attn = _rand_inputs(rng)
    value_j = jnp.asarray(value, dtype=jnp.float32)
    locs_j = jnp.asarray(locs, dtype=jnp.float32)
    attn_j = jnp.asarray(attn, dtype=jnp.float32)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(value_j, locs_j, attn_j)
    eps = 1e-3
    for argi, x in enumerate((value, locs, attn)):
        g = np.asarray(grads[argi])
        flat = x.reshape(-1)
        # probe a handful of coordinates
        idxs = np.linspace(0, flat.size - 1, 7).astype(int)
        for idx in idxs:
            xp = flat.copy(); xp[idx] += eps
            xm = flat.copy(); xm[idx] -= eps
            args_p = [value, locs, attn]
            args_m = [value, locs, attn]
            args_p[argi] = xp.reshape(x.shape)
            args_m[argi] = xm.reshape(x.shape)
            fd = (
                float(loss(*[jnp.asarray(a, dtype=jnp.float64) for a in args_p]))
                - float(loss(*[jnp.asarray(a, dtype=jnp.float64) for a in args_m]))
            ) / (2 * eps)
            np.testing.assert_allclose(g.reshape(-1)[idx], fd, rtol=2e-2, atol=1e-4)


def test_gradient_of_locations_zero_outside_domain(rng):
    """Sampling far outside the feature map must not leak gradient."""
    value, locs, attn = _rand_inputs(rng)
    locs = np.full_like(locs, 5.0)  # grossly out of bounds

    def loss(l):
        return jnp.sum(
            ms_deform_attn(jnp.asarray(value, jnp.float32), SHAPES, l, jnp.asarray(attn, jnp.float32))
        )

    g = jax.grad(loss)(jnp.asarray(locs, jnp.float32))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
