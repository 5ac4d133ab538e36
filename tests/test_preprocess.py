"""Pseudo-label generator (SURVEY §2.4): SimModel point/bbox modes, the
distance-transform object center, dense-CRF refinement, and the per-frame
h5 payload generation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocpg_tpu.preprocess.generate_anno import generate_for_frame, object_center
from ocpg_tpu.preprocess.sim_model import forward_bbox, forward_point, init_sim_model


@pytest.fixture(scope="module")
def sim_model():
    from ocpg_tpu.models.backbone_resnet import build_resnet

    # resnet50 keeps the test light; the pipeline is arch-agnostic
    model = build_resnet("resnet50", dilation=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    return model, params


def test_object_center_is_interior():
    mask = np.zeros((40, 60), np.uint8)
    mask[10:30, 20:50] = 1
    cx, cy = object_center(mask)
    assert mask[cy, cx] == 1
    # the distance-transform argmax is maximally interior: for a 30x20 box the
    # inscribed radius is ~10px, so the point sits >= 9px from every edge
    assert 20 + 9 <= cx <= 49 - 9 and 10 + 9 <= cy <= 29 - 9


def test_forward_point_properties(rng, sim_model):
    model, params = sim_model
    img = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    heat = forward_point(model, params, img, (0.5, 0.5))
    assert heat.shape == (2, 3)            # layer4 at stride 32
    assert np.isfinite(heat).all()
    # reference normalisation (a - min) / max: min maps to 0
    assert abs(heat.min()) < 1e-6


def test_forward_bbox_properties(rng, sim_model):
    model, params = sim_model
    img = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    heat = forward_bbox(model, params, img, (10.0, 10.0, 90.0, 60.0))
    assert heat.shape == (2, 3)
    assert np.isfinite(heat).all()
    assert abs(heat.min()) < 1e-6


def test_generate_for_frame_shapes_and_centers(rng, sim_model):
    model, params = sim_model
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    masks = np.zeros((2, 64, 96), np.float32)
    masks[0, 8:30, 10:40] = 1
    masks[1, 40:60, 50:90] = 1
    hb, hp, cp = generate_for_frame(model, params, img, masks)
    assert hb.shape == hp.shape == (2, 64, 96)
    assert cp.shape == (2, 2)
    for i in range(2):
        cx, cy = int(cp[i][0]), int(cp[i][1])
        assert masks[i, cy, cx] == 1       # centers are interior points
    # empty instance -> zero maps and (0, 0) center
    hb0, hp0, cp0 = generate_for_frame(model, params, img,
                                       np.zeros((1, 64, 96), np.float32))
    assert (hb0 == 0).all() and (hp0 == 0).all() and (cp0 == 0).all()


def test_dense_crf_refines_toward_unary():
    from ocpg_tpu.preprocess.dense_crf import apply_dense_crf

    rng = np.random.default_rng(0)
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :16] = 200                       # two flat color regions
    prob = np.full((32, 32), 0.1, np.float32)
    prob[:, :16] = 0.9                      # confident on the left region
    prob += rng.normal(0, 0.02, prob.shape).astype(np.float32)
    out = apply_dense_crf(img, np.clip(prob, 0.01, 0.99))
    assert out.shape == (32, 32)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # mean-field sharpens within the uniform color regions
    assert out[:, :14].mean() > 0.8
    assert out[:, 18:].mean() < 0.2


def test_dense_crf_window_vs_exact_oracle():
    """Bound the windowed mean-field's error against an EXACT O(N^2)
    fully-connected oracle (VERDICT r4 next-step 6; reference
    pre_process/dense_crf.py:10-36 uses pydensecrf's full-connectivity
    permutohedral kernels, absent from this image).

    Pins three facts on a small synthetic scene:
      1. the window evaluated at full radius IS the dense model (same
         kernels/normalization/update) — float-eps equality;
      2. at the production defaults (radius=5, n_iters=5) the window and the
         dense model converge to the SAME fixed point: maxabs <= 0.01 and
         mask IoU == 1.0 across sigma settings (measured residual ~4e-4;
         mid-iteration transients can disagree near the decision boundary,
         so the bound is stated at convergence, with a looser IoU >= 0.9
         transient bound at n_iters=3);
      3. an under-sized window (radius=2) measurably deviates — the bound
         in (2) is not vacuous.
    """
    from ocpg_tpu.preprocess.dense_crf import apply_dense_crf

    rng = np.random.default_rng(0)
    h = w = 32
    img = np.full((h, w, 3), 40.0) + rng.normal(0, 8, (h, w, 3))
    img[8:24, 10:26] = 180.0 + rng.normal(0, 8, (16, 16, 3))
    img = img.clip(0, 255).astype(np.uint8)
    prob = np.full((h, w), 0.2, np.float32)
    prob[10:22, 12:24] = 0.8
    prob = (prob + rng.normal(0, 0.15, (h, w))).clip(0.01, 0.99)

    def iou(a, b):
        a, b = a > 0.5, b > 0.5
        return (a & b).sum() / max((a | b).sum(), 1)

    for kw in ({}, {"sxy_gaussian": 2.0, "srgb_bilateral": 8.0}):
        dense = apply_dense_crf(img, prob, n_iters=5, exact=True, **kw)
        # (2) production radius at convergence: same fixed point
        win = apply_dense_crf(img, prob, n_iters=5, radius=5, **kw)
        assert np.abs(win - dense).max() <= 0.01, kw
        assert iou(win, dense) == 1.0, kw
        # transient bound (pre-convergence disagreement is boundary-local)
        dense3 = apply_dense_crf(img, prob, n_iters=3, exact=True, **kw)
        win3 = apply_dense_crf(img, prob, n_iters=3, radius=5, **kw)
        assert iou(win3, dense3) >= 0.9, kw

    # (1) full-radius window == dense, float eps (one setting is enough —
    # it proves both paths implement the same math)
    dense = apply_dense_crf(img, prob, n_iters=3, exact=True)
    full = apply_dense_crf(img, prob, n_iters=3, radius=max(h, w))
    np.testing.assert_allclose(full, dense, atol=1e-5)

    # (3) the bound is not vacuous: radius=2 visibly truncates
    dense5 = apply_dense_crf(img, prob, n_iters=5, exact=True)
    win2 = apply_dense_crf(img, prob, n_iters=5, radius=2)
    assert np.abs(win2 - dense5).max() > 0.05
