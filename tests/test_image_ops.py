"""Resize/pixel-shuffle parity vs torch.nn.functional."""
import numpy as np
import pytest

import jax.numpy as jnp

from ocpg_tpu.ops import (
    bicubic_resize,
    bilinear_resize,
    nearest_resize,
    pixel_shuffle,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _to_nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("size", [(7, 9), (16, 20), (3, 3)])
def test_nearest(rng, size):
    x = rng.random((2, 10, 12, 3)).astype(np.float32)
    expected = _to_nhwc(F.interpolate(_nchw(x), size=size, mode="nearest"))
    got = np.asarray(nearest_resize(jnp.asarray(x), size))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("size", [(7, 9), (20, 24), (40, 48)])
def test_bilinear(rng, align, size):
    x = rng.random((2, 10, 12, 3)).astype(np.float32)
    expected = _to_nhwc(F.interpolate(_nchw(x), size=size, mode="bilinear", align_corners=align))
    got = np.asarray(bilinear_resize(jnp.asarray(x), size, align_corners=align))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("size", [(7, 9), (20, 24)])
def test_bicubic(rng, size):
    x = rng.random((2, 10, 12, 3)).astype(np.float32)
    expected = _to_nhwc(F.interpolate(_nchw(x), size=size, mode="bicubic", align_corners=False))
    got = np.asarray(bicubic_resize(jnp.asarray(x), size, align_corners=False))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("r,c", [(4, 1), (2, 3)])
def test_pixel_shuffle(rng, r, c):
    x = rng.random((2, 5, 6, c * r * r)).astype(np.float32)
    expected = _to_nhwc(F.pixel_shuffle(_nchw(x), r))
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("factor", [(4, 4), (2, 3), (1, 2)])
def test_nearest_integer_factor_fast_path(rng, factor):
    """Integer-factor upsample takes the repeat fast path — output must be
    identical to torch nearest (each source pixel repeated r times)."""
    rh, rw = factor
    x = rng.random((2, 6, 5, 3)).astype(np.float32)
    size = (6 * rh, 5 * rw)
    expected = _to_nhwc(F.interpolate(_nchw(x), size=size, mode="nearest"))
    got = np.asarray(nearest_resize(jnp.asarray(x), size))
    np.testing.assert_array_equal(got, expected)


def test_resize_bf16_path_close_to_f32():
    """bf16 inputs use bf16 operands with f32 accumulation — results must
    stay within bf16 resolution of the f32 reference path."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 12, 16, 8)).astype(np.float32)
    for fn in (lambda a: bilinear_resize(a, (24, 32)),
               lambda a: bicubic_resize(a, (6, 8)),
               lambda a: nearest_resize(a, (7, 9))):
        ref = np.asarray(fn(jnp.asarray(x)))
        got = np.asarray(fn(jnp.asarray(x, jnp.bfloat16))).astype(np.float32)
        scale = max(np.abs(ref).max(), 1e-3)
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)
