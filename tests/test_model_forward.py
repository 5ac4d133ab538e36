"""End-to-end smoke tests: OCPG forward (train & eval branches) + criterion."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocpg_tpu.config import OCPGConfig
from ocpg_tpu.models import build_model
from ocpg_tpu.models.criterion import compute_criterion

B, T, H, W, LT = 1, 2, 64, 64, 8


def tiny_cfg(**kw):
    base = dict(
        backbone="resnet50",
        enc_layers=1,
        dec_layers=2,
        dim_feedforward=64,
        num_queries=5,
        num_frames=T,
        compute_dtype="float32",
        dataset_file="ytvos",
        text_layers=2, text_hidden=128, text_heads=4, text_ffn=256, text_vocab=2048,
    )
    base.update(kw)
    return OCPGConfig(**base)


def make_batch(rng, b=B, t=T, h=H, w=W):
    samples = rng.standard_normal((b, t, h, w, 3)).astype(np.float32)
    samples_mask = np.zeros((b, t, h, w), dtype=bool)
    samples_mask[..., -8:] = True  # simulated right padding
    text_ids = rng.integers(4, 1000, size=(b, LT)).astype(np.int32)
    text_mask = np.ones((b, LT), dtype=np.int32)
    text_mask[:, -2:] = 0
    sizes = np.tile(np.array([[h, w - 8]], np.int32), (b, 1))
    targets = {
        "labels": np.zeros((b, t), np.int32),
        "boxes": np.tile(np.array([0.4, 0.5, 0.3, 0.4], np.float32), (b, t, 1)),
        "valid": np.ones((b, t), np.int32),
        "masks": (rng.random((b, t, h, w)) > 0.7).astype(np.float32),
        "weights": rng.random((b, t, h, w)).astype(np.float32),
        "weak_masks": (rng.random((b, t, h, w)) > 0.6).astype(np.float32),
        "size": sizes,
    }
    return samples, samples_mask, text_ids, text_mask, sizes, targets


@pytest.fixture(scope="module")
def model_and_batch():
    rng = np.random.default_rng(0)
    cfg = tiny_cfg()
    model, matcher_cfg, criterion_cfg, weight_dict = build_model(cfg)
    batch = make_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch[0]), jnp.asarray(batch[1]), jnp.asarray(batch[2]),
        jnp.asarray(batch[3]), jnp.asarray(batch[4]),
        targets={k: jnp.asarray(v) for k, v in batch[5].items()},
        train=True,
    )
    return cfg, model, params, batch, criterion_cfg, weight_dict


def test_train_forward_and_criterion(model_and_batch):
    cfg, model, params, batch, criterion_cfg, weight_dict = model_and_batch
    samples, mask, ids, tmask, sizes, targets = batch
    out = model.apply(
        params, jnp.asarray(samples), jnp.asarray(mask), jnp.asarray(ids),
        jnp.asarray(tmask), jnp.asarray(sizes),
        targets={k: jnp.asarray(v) for k, v in targets.items()},
        train=True,
    )
    assert out["pred_logits"].shape == (B, T, cfg.num_queries, 1)
    assert out["pred_boxes"].shape == (B, T, cfg.num_queries, 4)
    assert out["pred_masks"].shape == (B, T, H, W)
    assert out["pred_masks_low"].shape == (B, T, H // 2, W // 2)
    assert out["outputs_class"].shape[0] == cfg.dec_layers
    assert np.isfinite(np.asarray(out["pred_masks"])).all()

    total, losses = compute_criterion(
        criterion_cfg, weight_dict, out,
        {k: jnp.asarray(v) for k, v in targets.items()}, jnp.asarray(0),
    )
    assert np.isfinite(float(total)), losses
    # all weighted keys present for main + aux layers
    for key in ("loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_proj",
                "loss_lst", "loss_mask_low", "loss_ce_0", "loss_proj_0"):
        assert key in losses, key
        assert np.isfinite(float(losses[key])), key


def test_criterion_with_pairwise_knob(model_and_batch):
    """Opt-in BoxInst pairwise losses (models/pairwise.py): emitted for every
    decoder layer, finite, neighbor term zero at T=2 (<3 frames), and the
    gradient flows through the mask logits."""
    import dataclasses

    cfg, model, params, batch, criterion_cfg, weight_dict = model_and_batch
    samples, mask, ids, tmask, sizes, targets = batch
    out = model.apply(
        params, jnp.asarray(samples), jnp.asarray(mask), jnp.asarray(ids),
        jnp.asarray(tmask), jnp.asarray(sizes),
        targets={k: jnp.asarray(v) for k, v in targets.items()},
        train=True,
    )
    pcfg = dataclasses.replace(criterion_cfg, pairwise=True)
    wd = dict(weight_dict)
    wd["loss_pairwise"] = wd["loss_pairwise_neighbor"] = 1.0
    jt = {k: jnp.asarray(v) for k, v in targets.items()}

    def total_of(pml):
        o = dict(out)
        o["pred_masks_low_layers"] = pml
        total, losses = compute_criterion(pcfg, wd, o, jt, jnp.asarray(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(total_of, has_aux=True)(
        out["pred_masks_low_layers"])
    for key in ("loss_pairwise", "loss_pairwise_0",
                "loss_pairwise_neighbor", "loss_pairwise_neighbor_0"):
        assert key in losses, key
        assert np.isfinite(float(losses[key])), key
    assert float(losses["loss_pairwise"]) > 0.0
    assert float(losses["loss_pairwise_neighbor"]) == 0.0   # T=2 < 3
    g = np.asarray(grads)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0

    # the knob threads from OCPGConfig through build_model
    from ocpg_tpu.models.build import build_weight_dict

    cfg_on = cfg.replace(pairwise_loss=True)
    wd_on = build_weight_dict(cfg_on)
    assert "loss_pairwise" in wd_on and "loss_pairwise_neighbor" in wd_on
    assert "loss_pairwise" not in build_weight_dict(cfg)
    assert build_model(cfg_on)[2].pairwise is True


def test_eval_forward_davis_branch(model_and_batch):
    cfg, model, params, batch, *_ = model_and_batch
    samples, mask, ids, tmask, sizes, _ = batch
    out = model.apply(
        params, jnp.asarray(samples), jnp.asarray(mask), jnp.asarray(ids),
        jnp.asarray(tmask), jnp.asarray(sizes), train=False,
    )
    assert out["pred_masks"].shape == (B, T, 1, H, W)
    assert out["pred_logits"].shape == (B, T, 1, 1)
    assert out["reference_points"].shape == (B, T, 1, 2)


def test_eval_forward_a2d_branch(model_and_batch):
    cfg, model, params, batch, *_ = model_and_batch
    samples, mask, ids, tmask, sizes, _ = batch
    cfg_a2d = cfg.replace(dataset_file="a2d")
    model_a2d, *_ = build_model(cfg_a2d)
    out = model_a2d.apply(
        params, jnp.asarray(samples), jnp.asarray(mask), jnp.asarray(ids),
        jnp.asarray(tmask), jnp.asarray(sizes),
        valid_indices=jnp.zeros((B,), jnp.int32), train=False,
    )
    # valid_indices reduces T to 1
    assert out["pred_masks"].shape == (B, 1, cfg.num_queries, H, W)
