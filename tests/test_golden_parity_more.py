"""Golden-parity breadth: the three branches the original golden test left
uncovered (VERDICT round-1 #4):

1. the Video-Swin backbone variant of the FULL model (torch replica with
   reference swin keys -> convert_ocpg -> JAX), reference
   /root/reference/models/video_swin_transformer.py:638-701;
2. the A2D all-queries eval branch (valid-indices select + MSO on every
   query), reference /root/reference/models/ocpg.py:434-445;
3. the criterion on converted weights: torch train-branch outputs + torch
   losses vs the JAX train branch + compute_criterion, reference
   /root/reference/models/criterion.py:213-254.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_golden_parity import _randomize  # noqa: E402

B, T, H, W, LT = 1, 2, 192, 256, 8


def _tiny_text_cfg():
    from transformers import RobertaConfig as HFConfig

    return HFConfig(vocab_size=1000, hidden_size=128, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=256,
                    max_position_embeddings=40, type_vocab_size=1,
                    pad_token_id=1, layer_norm_eps=1e-5)


def _inputs(rng):
    samples = np.asarray(rng.standard_normal((B, T, 3, H, W)), np.float32)
    smask = np.zeros((B, T, H, W), bool)
    smask[..., -32:] = True
    smask[..., -16:, :] = True
    ids = np.asarray(rng.integers(4, 999, (B, LT)), np.int64)
    mask = np.ones((B, LT), np.int64)
    ids[:, -2:] = 1
    mask[:, -2:] = 0
    sizes = np.asarray([[H - 16, W - 32]], np.int32)
    return samples, smask, ids, mask, sizes


def _tiny_jax_cfg(**kw):
    from ocpg_tpu.config import OCPGConfig

    base = dict(backbone="resnet50", enc_layers=1, dec_layers=2,
                dim_feedforward=64, num_queries=5, num_frames=T,
                compute_dtype="float32", dataset_file="davis",
                text_layers=2, text_hidden=128, text_heads=4,
                text_ffn=256, text_vocab=1000, text_max_pos=40,
                msda_impl="xla")
    base.update(kw)
    return OCPGConfig(**base)


SWIN_CFG = dict(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8))


def test_video_swin_full_model_golden(rng):
    """Full-model DAVIS eval parity with the Video-Swin backbone."""
    from tests.torch_replica import OCPGReplica

    from ocpg_tpu.models import build_model
    from ocpg_tpu.utils.torch_weights import convert_ocpg

    replica = OCPGReplica(_tiny_text_cfg(), enc=1, dec=2, ffn=64, queries=5,
                          swin_cfg=SWIN_CFG).eval()
    _randomize(replica, seed=3)

    samples, smask, ids, mask, sizes = _inputs(rng)
    t_out = replica(torch.from_numpy(samples), torch.from_numpy(smask),
                    torch.from_numpy(ids), torch.from_numpy(mask),
                    torch.from_numpy(sizes))

    params, frozen = convert_ocpg(
        replica.state_dict(), enc_layers=1, dec_layers=2,
        backbone="video_swin_test", text_layers=2)
    assert not frozen, "swin backbone has no BN running stats"
    cfg = _tiny_jax_cfg(backbone="video_swin_test")
    model, *_ = build_model(cfg)
    j_out = model.apply(
        {"params": params},
        jnp.asarray(samples.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(smask), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(sizes), train=False)

    np.testing.assert_allclose(np.asarray(j_out["pred_logits"]),
                               t_out["pred_logits"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_out["pred_boxes"]),
                               t_out["pred_boxes"].numpy(), atol=2e-3)
    jm = np.asarray(j_out["pred_masks"])
    tm = t_out["pred_masks"].numpy()
    assert jm.shape == tm.shape == (B, T, 1, H, W)
    scale = max(np.abs(tm).max(), 1e-3)
    np.testing.assert_allclose(jm / scale, tm / scale, atol=5e-3)


@pytest.fixture(scope="module")
def r50_replica_and_params():
    from tests.torch_replica import OCPGReplica

    from ocpg_tpu.utils.torch_weights import convert_ocpg

    replica = OCPGReplica(_tiny_text_cfg(), resnet_layers=(3, 4, 6, 3),
                          enc=1, dec=2, ffn=64, queries=5).eval()
    _randomize(replica, seed=2)
    params, frozen = convert_ocpg(
        replica.state_dict(), enc_layers=1, dec_layers=2,
        backbone="resnet50", text_layers=2)
    return replica, {"params": params, "frozen": frozen}


def test_a2d_all_queries_golden(rng, r50_replica_and_params):
    """A2D eval branch: valid-frame select + MSO on EVERY query."""
    from ocpg_tpu.models import build_model

    replica, variables = r50_replica_and_params
    samples, smask, ids, mask, sizes = _inputs(rng)
    valid_indices = np.asarray([1], np.int32)

    t_out = replica.forward_a2d(
        torch.from_numpy(samples), torch.from_numpy(smask),
        torch.from_numpy(ids), torch.from_numpy(mask),
        torch.from_numpy(sizes), torch.from_numpy(valid_indices))

    cfg = _tiny_jax_cfg(dataset_file="a2d")
    model, *_ = build_model(cfg)
    j_out = model.apply(
        variables,
        jnp.asarray(samples.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(smask), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(sizes),
        valid_indices=jnp.asarray(valid_indices), train=False)

    np.testing.assert_allclose(np.asarray(j_out["pred_logits"]),
                               t_out["pred_logits"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_out["pred_boxes"]),
                               t_out["pred_boxes"].numpy(), atol=2e-3)
    jm = np.asarray(j_out["pred_masks"])
    tm = t_out["pred_masks"].numpy()
    assert jm.shape == tm.shape == (B, 1, 5, H, W)      # (B, T=1, Q, H, W)
    scale = max(np.abs(tm).max(), 1e-3)
    np.testing.assert_allclose(jm / scale, tm / scale, atol=5e-3)


def _synthetic_targets(rng):
    boxes = np.zeros((B, T, 4), np.float32)
    masks = np.zeros((B, T, H, W), np.float32)
    heat = np.zeros((B, T, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for j in range(T):
        cx, cy, bw, bh = 0.4 + 0.02 * j, 0.5, 0.3, 0.4
        boxes[0, j] = (cx, cy, bw, bh)
        masks[0, j, int((cy - bh / 2) * H):int((cy + bh / 2) * H),
              int((cx - bw / 2) * W):int((cx + bw / 2) * W)] = 1.0
        heat[0, j] = np.exp(-(((xx - cx * W) ** 2) / (2 * (bw * W / 3) ** 2)
                              + ((yy - cy * H) ** 2) / (2 * (bh * H / 3) ** 2)))
    return {
        "labels": np.zeros((B, T), np.int32),
        "boxes": boxes,
        "valid": np.ones((B, T), np.int32),
        "masks": masks,
        "weights": heat.astype(np.float32),
        "weak_masks": (heat > 0.5).astype(np.float32),
        "size": np.asarray([[H - 16, W - 32]], np.int32),
    }


def _np_giou_aligned(a_xyxy, b_xyxy):
    lt = np.maximum(a_xyxy[:, :2], b_xyxy[:, :2])
    rb = np.minimum(a_xyxy[:, 2:], b_xyxy[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a_xyxy[:, 2] - a_xyxy[:, 0]) * (a_xyxy[:, 3] - a_xyxy[:, 1])
    area_b = (b_xyxy[:, 2] - b_xyxy[:, 0]) * (b_xyxy[:, 3] - b_xyxy[:, 1])
    union = area_a + area_b - inter
    iou = inter / np.clip(union, 1e-6, None)
    lt2 = np.minimum(a_xyxy[:, :2], b_xyxy[:, :2])
    rb2 = np.maximum(a_xyxy[:, 2:], b_xyxy[:, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    hull = wh2[:, 0] * wh2[:, 1]
    return iou - (hull - union) / np.clip(hull, 1e-6, None)


def _np_cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _rasterize_region(boxes_cxcywh, sizes, im_h, im_w):
    """box_region_mask semantics (segmentation.py:223-237): int() truncation."""
    n = boxes_cxcywh.shape[0]
    xyxy = _np_cxcywh_to_xyxy(boxes_cxcywh)
    out = np.zeros((n, im_h, im_w), np.float32)
    for i in range(n):
        h, w = sizes[i]
        x0, y0, x1, y1 = (xyxy[i] * np.asarray([w, h, w, h])).astype(np.int32)
        if x1 > x0 and y1 > y0:
            out[i, y0:y1, x0:x1] = 1.0
    return out


def torch_criterion_losses(outputs, targets, matched, step, warmup_iters=100000):
    """Reference SetCriterion per-layer losses on torch train-branch outputs
    (criterion.py:46-190 + segmentation.py:173-315), via the torch loss
    oracles in tests/test_losses.py."""
    import torch.nn.functional as F

    from tests.test_losses import torch_levelset, torch_masked_ce, torch_proj

    L = outputs["outputs_class"].shape[0]
    valid = targets["valid"]
    num_boxes = max(float(valid.sum()), 1.0)
    heat, weak = targets["weights"], targets["weak_masks"]
    heat_low = heat[:, :, 1::2, 1::2]
    weak_low_raw = weak[:, :, 1::2, 1::2]
    sizes_bt = np.repeat(targets["size"], T, axis=0)
    region = _rasterize_region(targets["boxes"].reshape(-1, 4), sizes_bt, H, W)
    region = region.reshape(B, T, H, W)
    region_low = region[:, :, 1::2, 1::2]
    weak_m = weak * region
    weak_low = weak_low_raw * region_low
    warmup = min(step / warmup_iters, 1.0)

    ls = outputs["ls_features"].numpy()                     # (B,T,12,h2,w2)
    lh, lw = ls.shape[-2:]
    tgt_nchw = ls[:, :, :-1].reshape(B * T, -1, lh, lw)

    losses = {}
    for l in range(L):
        suffix = "" if l == L - 1 else f"_{l}"
        logits = outputs["outputs_class"][l].numpy()        # (B,T,Q,K)
        b_, t_, q_, k_ = logits.shape
        lg = logits.reshape(b_, t_ * q_, k_)
        pos = (valid[:, :, None] > 0) & (np.arange(q_)[None, None] == matched[l][:, None, None])
        onehot = pos[..., None].astype(np.float32).reshape(b_, t_ * q_, k_)
        lt = torch.from_numpy(lg)
        tt = torch.from_numpy(onehot)
        prob = lt.sigmoid()
        ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
        p_t = prob * tt + (1 - prob) * (1 - tt)
        focal = ce * ((1 - p_t) ** 2)
        alpha_t = 0.25 * tt + 0.75 * (1 - tt)
        losses[f"loss_ce{suffix}"] = float(
            (alpha_t * focal).mean(1).sum() / num_boxes) * (t_ * q_)

        coords = outputs["outputs_coord"][l].numpy()
        src = np.take_along_axis(coords, matched[l][:, None, None, None], axis=2)[:, :, 0]
        src = src.reshape(-1, 4)
        tgt = targets["boxes"].reshape(-1, 4)
        losses[f"loss_bbox{suffix}"] = float(np.abs(src - tgt).sum() / num_boxes)
        giou = _np_giou_aligned(_np_cxcywh_to_xyxy(src), _np_cxcywh_to_xyxy(tgt))
        losses[f"loss_giou{suffix}"] = float((1 - giou).sum() / num_boxes)

        pm = outputs["pred_masks_layers"][l].numpy()        # (B,T,H,W)
        pml = outputs["pred_masks_low_layers"][l].numpy()   # (B,T,h2,w2)
        losses[f"loss_proj{suffix}"] = torch_proj(pm, region, weak_m)
        losses[f"loss_mask{suffix}"] = (1 - warmup) * torch_masked_ce(
            pm, heat, weak_m, region)
        losses[f"loss_proj_low{suffix}"] = torch_proj(pml, region_low, weak_low)
        losses[f"loss_mask_low{suffix}"] = (1 - warmup) * torch_masked_ce(
            pml, heat_low, weak_low, region_low)

        src_scaled = F.interpolate(torch.from_numpy(pm).reshape(B * T, 1, H, W),
                                   size=(lh, lw), mode="bilinear",
                                   align_corners=True).numpy()
        region_scaled = F.interpolate(torch.from_numpy(region).reshape(B * T, 1, H, W),
                                      size=(lh, lw), mode="nearest").numpy()
        losses[f"loss_lst{suffix}"] = warmup * torch_levelset(
            src_scaled, tgt_nchw, region_scaled)
        losses[f"loss_lst_low{suffix}"] = warmup * torch_levelset(
            pml.reshape(B * T, 1, lh, lw), tgt_nchw, region_scaled)
    return losses


def test_criterion_on_converted_weights_golden(rng, r50_replica_and_params):
    """Train branch + criterion: torch replica losses == JAX compute_criterion
    on the converted model, matcher agreement included."""
    from tests.test_matcher import torch_reference_match

    from ocpg_tpu.models import build_model
    from ocpg_tpu.models.criterion import compute_criterion
    from ocpg_tpu.models.matcher import MatcherConfig

    replica, variables = r50_replica_and_params
    samples, smask, ids, mask, sizes = _inputs(rng)
    targets = _synthetic_targets(rng)
    targets["size"] = sizes
    step = 50_000                      # warmup = 0.5: CE and LST both active

    # torch side: trunk -> matcher -> train branch
    tr = replica._trunk(torch.from_numpy(samples), torch.from_numpy(smask),
                        torch.from_numpy(ids), torch.from_numpy(mask),
                        torch.from_numpy(sizes))
    mcfg = MatcherConfig()
    matched = np.stack([
        torch_reference_match(
            mcfg, tr["logits"][l].numpy(), tr["coords"][l].numpy(),
            tr["shuffled"][l].numpy(), targets["labels"], targets["boxes"],
            targets["masks"], targets["valid"])
        for l in range(2)
    ])
    t_out = replica.forward_train(
        torch.from_numpy(samples), torch.from_numpy(smask),
        torch.from_numpy(ids), torch.from_numpy(mask),
        torch.from_numpy(sizes), matched)
    t_losses = torch_criterion_losses(t_out, targets, matched, step)

    # JAX side: train branch on converted weights + compute_criterion
    cfg = _tiny_jax_cfg(dataset_file="ytvos")
    model, _, criterion_cfg, weight_dict = build_model(cfg)
    jt = {k: jnp.asarray(v) for k, v in targets.items()}
    j_out = model.apply(
        variables,
        jnp.asarray(samples.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(smask), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(sizes),
        targets=jt, train=True, deterministic=True)

    # matcher agreement on converted weights
    np.testing.assert_array_equal(np.asarray(j_out["matched"]), matched)

    # train-branch tensor parity
    jm = np.asarray(j_out["pred_masks_layers"])
    tm = t_out["pred_masks_layers"].numpy()
    scale = max(np.abs(tm).max(), 1e-3)
    np.testing.assert_allclose(jm / scale, tm / scale, atol=5e-3)
    jls = np.asarray(j_out["ls_features"])                  # (B,T,h2,w2,12)
    tls = t_out["ls_features"].numpy().transpose(0, 1, 3, 4, 2)
    lscale = max(np.abs(tls).max(), 1e-3)
    np.testing.assert_allclose(jls / lscale, tls / lscale, atol=5e-3)

    total, j_losses = compute_criterion(criterion_cfg, weight_dict, j_out, jt,
                                        jnp.asarray(step))
    for k, tv in t_losses.items():
        jv = float(j_losses[k])
        np.testing.assert_allclose(jv, tv, rtol=2e-2, atol=2e-3, err_msg=k)
    t_total = sum(t_losses[k] * weight_dict[k] for k in t_losses if k in weight_dict)
    np.testing.assert_allclose(float(total), t_total, rtol=2e-2)
