"""Pallas MSDA kernel vs the XLA production op (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ocpg_tpu.ops import ms_deform_attn
from ocpg_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

SHAPES = ((6, 4), (3, 2))


def test_pallas_matches_xla_interpret(rng):
    n, m, d, lq, p = 2, 4, 8, 5, 3
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.random((n, s, m, d)), jnp.float32)
    locs = jnp.asarray(rng.random((n, lq, m, len(SHAPES), p, 2)) * 1.2 - 0.1, jnp.float32)
    attn = jnp.asarray(rng.random((n, lq, m, len(SHAPES), p)), jnp.float32)
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)

    expected = ms_deform_attn(value, SHAPES, locs, attn)
    got = ms_deform_attn_pallas(value, SHAPES, locs, attn, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-6)
