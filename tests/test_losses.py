"""Loss parity vs torch implementations of the reference formulas
(segmentation.py:173-315, criterion.py:46-107)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ocpg_tpu.models.criterion import (
    box_region_mask,
    dice_coefficient,
    levelset_loss,
    masked_ce_loss,
    proj_loss,
    sigmoid_focal_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_masked_ce(inputs, weights, masks, box_regions, alpha=0.7, beta=0.3, thres=0.5):
    inputs = torch.from_numpy(inputs)
    weight = torch.from_numpy(weights).clone()
    masks = torch.from_numpy(masks)
    weight[weight > alpha] = alpha
    weight[weight < beta] = beta
    weight = torch.abs(weight - thres)
    weight = (weight - weight.min()) / (weight.max() - weight.min() + 1e-5)
    x = inputs.sigmoid()
    if box_regions is not None:
        weight[torch.from_numpy(box_regions) == 0] = 1
    return float(F.binary_cross_entropy_with_logits(x * weight, masks * weight))


def torch_proj(inputs, box_regions, masks, with_mean_term=True):
    def dice(x, t):
        n = x.size(0)
        x = x.reshape(n, -1)
        t = t.reshape(n, -1)
        inter = (x * t).sum(1)
        union = (x**2).sum(1) + (t**2).sum(1) + 1e-5
        return 1.0 - 2 * inter / union

    x = torch.from_numpy(inputs).sigmoid()
    br = torch.from_numpy(box_regions)
    m = torch.from_numpy(masks)
    ly = dice(x.max(dim=2, keepdim=True)[0], br.max(dim=2, keepdim=True)[0])
    lx = dice(x.max(dim=3, keepdim=True)[0], br.max(dim=3, keepdim=True)[0])
    loss_max = (ly + lx).mean()
    ly = dice(x.mean(dim=2, keepdim=True), m.float().mean(dim=2, keepdim=True))
    lx = dice(x.mean(dim=3, keepdim=True), m.float().mean(dim=3, keepdim=True))
    loss_mean = (ly + lx).mean()
    return float(loss_max + 0.1 * loss_mean if with_mean_term else loss_max)


def torch_levelset(mask_logits, targets, box_mask):
    ml = torch.from_numpy(mask_logits).sigmoid()
    tg = torch.from_numpy(targets)
    bm = torch.from_numpy(box_mask)
    back = 1.0 - ml
    scores = torch.cat((ml, back), dim=1)
    pixel_num = bm.sum((1, 2, 3)).clamp(min=1)
    phi = scores * bm
    tgt = tg * bm
    sf = phi[:, 0:1]
    sb = phi[:, 1:2]
    interior = (sf * tgt).sum((2, 3)) / sf.sum((2, 3)).clamp(min=1e-5)
    exterior = (sb * tgt).sum((2, 3)) / sb.sum((2, 3)).clamp(min=1e-5)
    region = (tgt - interior[..., None, None]) ** 2 * sf + (tgt - exterior[..., None, None]) ** 2 * sb
    region = region.sum((1, 2, 3)) / tg.shape[1]
    gh = torch.abs(phi[:, :, 1:, :] - phi[:, :, :-1, :]).sum((1, 2, 3))
    gw = torch.abs(phi[:, :, :, 1:] - phi[:, :, :, :-1]).sum((1, 2, 3))
    length = 1e-5 * (gh + gw)
    return float(((region + length) / pixel_num).mean())


@pytest.fixture
def data(rng):
    b, t, h, w = 2, 3, 16, 20
    inputs = rng.standard_normal((b, t, h, w)).astype(np.float32) * 2
    weights = rng.random((b, t, h, w)).astype(np.float32)
    masks = (rng.random((b, t, h, w)) > 0.5).astype(np.float32)
    region = np.zeros((b, t, h, w), np.float32)
    region[:, :, 4:12, 5:15] = 1
    return inputs, weights, masks, region


def test_masked_ce_loss(data):
    inputs, weights, masks, region = data
    got = float(masked_ce_loss(jnp.asarray(inputs), jnp.asarray(weights),
                               jnp.asarray(masks), jnp.asarray(region)))
    expected = torch_masked_ce(inputs, weights, masks, region)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_proj_loss(data):
    inputs, weights, masks, region = data
    got = float(proj_loss(jnp.asarray(inputs), jnp.asarray(region), jnp.asarray(masks)))
    expected = torch_proj(inputs, region, masks)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_levelset_loss(rng):
    n, c, h, w = 4, 11, 16, 20
    logits = rng.standard_normal((n, 1, h, w)).astype(np.float32)
    targets = rng.random((n, c, h, w)).astype(np.float32)
    box = np.zeros((n, 1, h, w), np.float32)
    box[:, :, 3:13, 4:16] = 1
    got = float(levelset_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(box)))
    expected = torch_levelset(logits, targets, box)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_sigmoid_focal_loss_matches_reference_formula(rng):
    b, n, k = 2, 10, 1
    logits = rng.standard_normal((b, n, k)).astype(np.float32)
    targets = (rng.random((b, n, k)) > 0.7).astype(np.float32)
    num_boxes = 3.0
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                   jnp.asarray(num_boxes)))
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(targets)
    prob = lt.sigmoid()
    ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = prob * tt + (1 - prob) * (1 - tt)
    loss = ce * ((1 - p_t) ** 2)
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    expected = float((alpha_t * loss).mean(1).sum() / num_boxes)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_box_region_mask_trunc_and_empty():
    boxes = np.array([[0.1, 0.2, 0.5, 0.6],     # valid
                      [0.3, 0.3, 0.3, 0.9]],    # zero width -> empty
                     np.float32)
    sizes = np.array([[20, 30], [20, 30]], np.int32)
    got = np.asarray(box_region_mask(jnp.asarray(boxes), 24, 32, jnp.asarray(sizes)))
    assert got.shape == (2, 24, 32)
    # row 0: x in [3, 15), y in [4, 12) (int() truncation)
    assert got[0, 4:12, 3:15].all()
    assert got[0].sum() == 8 * 12
    assert got[1].sum() == 0


def test_dice_coefficient_matches(rng):
    x = rng.random((3, 50)).astype(np.float32)
    t = (rng.random((3, 50)) > 0.5).astype(np.float32)
    got = np.asarray(dice_coefficient(jnp.asarray(x), jnp.asarray(t)))
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(t)
    inter = (xt * tt).sum(1)
    union = (xt**2).sum(1) + (tt**2).sum(1) + 1e-5
    expected = (1 - 2 * inter / union).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5)
