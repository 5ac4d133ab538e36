"""BoxInst pairwise machinery vs a torch F.unfold oracle.

The oracle re-states the reference formulation
(/root/reference/models/segmentation.py:358-500) with torch primitives —
deliberate test-fixture duplication so the JAX port in
ocpg_tpu/models/pairwise.py is pinned against the exact unfold ordering,
padding, and log-space algebra of the original.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ocpg_tpu.models.pairwise import (
    compute_pairwise_term,
    compute_pairwise_term_neighbor,
    get_images_color_similarity,
    get_neighbor_images_color_similarity,
    get_neighbor_images_patch_color_similarity,
    pairwise_losses,
    rgb2lab,
    unfold_w_center,
    unfold_wo_center,
)


# -- torch oracle (reference semantics, segmentation.py:358-500) --------------

def _t_unfold_w_center(x, kernel_size, dilation):
    padding = (kernel_size + (dilation - 1) * (kernel_size - 1)) // 2
    u = F.unfold(x, kernel_size=kernel_size, padding=padding, dilation=dilation)
    return u.reshape(x.size(0), x.size(1), -1, x.size(2), x.size(3))


def _t_unfold_wo_center(x, kernel_size, dilation):
    u = _t_unfold_w_center(x, kernel_size, dilation)
    size = kernel_size ** 2
    return torch.cat((u[:, :, : size // 2], u[:, :, size // 2 + 1:]), dim=2)


def _t_pairwise_term(mask_logits, k, d):
    log_fg = F.logsigmoid(mask_logits)
    log_bg = F.logsigmoid(-mask_logits)
    fg_u = _t_unfold_wo_center(log_fg, k, d)
    bg_u = _t_unfold_wo_center(log_bg, k, d)
    same_fg = log_fg[:, :, None] + fg_u
    same_bg = log_bg[:, :, None] + bg_u
    max_ = torch.max(same_fg, same_bg)
    log_same = torch.log(torch.exp(same_fg - max_) + torch.exp(same_bg - max_)) + max_
    return -log_same[:, 0]


def _t_pairwise_term_neighbor(mask_logits, mask_logits_neighbor, k, d):
    log_fg_n = F.logsigmoid(mask_logits_neighbor)
    log_bg_n = F.logsigmoid(-mask_logits_neighbor)
    fg_u = _t_unfold_w_center(F.logsigmoid(mask_logits), k, d)
    bg_u = _t_unfold_w_center(F.logsigmoid(-mask_logits), k, d)
    same_fg = log_fg_n[:, :, None] + fg_u
    same_bg = log_bg_n[:, :, None] + bg_u
    max_ = torch.max(same_fg, same_bg)
    log_same = torch.log(torch.exp(same_fg - max_) + torch.exp(same_bg - max_)) + max_
    return -log_same[:, 0]


def _t_images_color_similarity(images, k, d):
    u = _t_unfold_wo_center(images, k, d)
    diff = images[:, :, None] - u
    return torch.exp(-torch.norm(diff, dim=1) * 0.5)


def _t_neighbor_images_color_similarity(images, images_neighbor, k, d):
    u = _t_unfold_w_center(images, k, d)
    diff = images_neighbor[:, :, None] - u
    return torch.exp(-torch.norm(diff, dim=1) * 0.5)


def _t_neighbor_patch_color_similarity(images, images_neighbor, k, d):
    u = _t_unfold_w_center(images, k, 1).flatten(1, 2)
    un = _t_unfold_w_center(images_neighbor, k, 1).flatten(1, 2)
    return _t_neighbor_images_color_similarity(u, un, 3, 3)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("dilation", [1, 2, 3])
def test_unfold_matches_torch(rng, dilation):
    x = rng.standard_normal((2, 3, 10, 14)).astype(np.float32)
    for fn_j, fn_t in ((unfold_w_center, _t_unfold_w_center),
                       (unfold_wo_center, _t_unfold_wo_center)):
        got = np.asarray(fn_j(jnp.asarray(x), 3, dilation))
        want = fn_t(torch.from_numpy(x), 3, dilation).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dilation", [1, 2, 3])
def test_pairwise_term_matches_torch(rng, dilation):
    logits = (5 * rng.standard_normal((2, 1, 12, 16))).astype(np.float32)
    got = np.asarray(compute_pairwise_term(jnp.asarray(logits), 3, dilation))
    want = _t_pairwise_term(torch.from_numpy(logits), 3, dilation).numpy()
    assert got.shape == (2, 8, 12, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pairwise_term_neighbor_matches_torch(rng):
    a = (5 * rng.standard_normal((2, 1, 12, 16))).astype(np.float32)
    b = (5 * rng.standard_normal((2, 1, 12, 16))).astype(np.float32)
    got = np.asarray(compute_pairwise_term_neighbor(
        jnp.asarray(a), jnp.asarray(b), 3, 3))
    want = _t_pairwise_term_neighbor(
        torch.from_numpy(a), torch.from_numpy(b), 3, 3).numpy()
    assert got.shape == (2, 9, 12, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_color_similarity_matches_torch(rng):
    img = (100 * rng.standard_normal((1, 3, 12, 16))).astype(np.float32)
    nei = (100 * rng.standard_normal((1, 3, 12, 16))).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(get_images_color_similarity(jnp.asarray(img), 3, 2)),
        _t_images_color_similarity(torch.from_numpy(img), 3, 2).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(get_neighbor_images_color_similarity(
            jnp.asarray(img), jnp.asarray(nei), 3, 3)),
        _t_neighbor_images_color_similarity(
            torch.from_numpy(img), torch.from_numpy(nei), 3, 3).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(get_neighbor_images_patch_color_similarity(
            jnp.asarray(img), jnp.asarray(nei), 3, 3)),
        _t_neighbor_patch_color_similarity(
            torch.from_numpy(img), torch.from_numpy(nei), 3, 3).numpy(),
        rtol=1e-5, atol=1e-6)


def test_rgb2lab_known_values():
    """Standard CIE-Lab values for primary sRGB colors (D65, 2-deg observer;
    same targets skimage.color.rgb2lab produces)."""
    rgb = jnp.asarray([
        [1.0, 1.0, 1.0],   # white
        [0.0, 0.0, 0.0],   # black
        [1.0, 0.0, 0.0],   # red
        [0.0, 1.0, 0.0],   # green
        [0.0, 0.0, 1.0],   # blue
    ])
    lab = np.asarray(rgb2lab(rgb))
    want = np.array([
        [100.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [53.2406, 80.0942, 67.2015],
        [87.7351, -86.1813, 83.1775],
        [32.2970, 79.1875, -107.8602],
    ])
    np.testing.assert_allclose(lab, want, atol=0.02)


def test_pairwise_losses_composition(rng):
    """The criterion-facing composition: finite, non-negative, neighbor term
    zero for T<3, and identical-label logits give (near-)zero pairwise cost
    where color agrees."""
    b, t, h, w = 2, 3, 16, 16
    logits = (4 * rng.standard_normal((b, t, h, w))).astype(np.float32)
    img = (0.5 * rng.standard_normal((b, t, h, w, 3))).astype(np.float32)
    region = np.zeros((b, t, h, w), np.float32)
    region[:, :, 4:12, 4:12] = 1.0

    out = pairwise_losses(jnp.asarray(logits), jnp.asarray(img), jnp.asarray(region))
    assert set(out) == {"loss_pairwise", "loss_pairwise_neighbor"}
    for v in out.values():
        v = float(v)
        assert np.isfinite(v) and v >= 0.0

    # confident-and-constant logits -> P(same) ~ 1 -> loss ~ 0
    const = jnp.full((b, t, h, w), 20.0)
    out0 = pairwise_losses(const, jnp.asarray(img), jnp.asarray(region))
    assert float(out0["loss_pairwise"]) < 1e-3
    assert float(out0["loss_pairwise_neighbor"]) < 1e-3

    # T=2: no full triplet -> neighbor term exactly 0
    out2 = pairwise_losses(jnp.asarray(logits[:, :2]), jnp.asarray(img[:, :2]),
                           jnp.asarray(region[:, :2]))
    assert float(out2["loss_pairwise_neighbor"]) == 0.0
