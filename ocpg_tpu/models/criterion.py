"""Weak-supervision loss suite (SetCriterion).

Reference: /root/reference/models/criterion.py + the loss functions in
/root/reference/models/segmentation.py:173-316.

Losses:
  * labels — sigmoid focal classification on valid frames
    (criterion.py:46-82); the matched (query, valid-frame) slots are positives.
  * boxes — L1 + GIoU on the matched query, all frames (criterion.py:84-107).
  * masks — the OCPG weak-supervision stack (criterion.py:109-190):
      - masked BCE against pseudo heatmaps with confidence-derived pixel
        weights (`masked_ce_loss`, segmentation.py:173-200)
      - box-projection dice (`proj_loss`, segmentation.py:252-276)
      - Chan–Vese level-set loss over [img, learned 8-ch feats] targets
        (`levelset_loss`, segmentation.py:278-315), with a linear warmup over
        100k iters shifting weight CE -> level-set (criterion.py:158,183-187)
      - each at full resolution and at 1/2 resolution (`*_low`).

All functions are shape-static and jit-safe: targets arrive as dense, padded
arrays; frame validity and batch-size normalisation are handled with masks.
`num_boxes` is the *global* valid-frame count (the reference all-reduces and
divides by world size, criterion.py:224-230; under a single jitted program
over globally sharded arrays the global sum is the direct equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou_aligned

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CriterionConfig:
    num_classes: int = 1
    focal_alpha: float = 0.25
    lst_warmup_iters: int = 100_000
    mask_out_stride: int = 1       # criterion.py:40
    mask_out_stride_low: int = 2   # criterion.py:41
    # opt-in BoxInst pairwise loss (models/pairwise.py; dead code upstream)
    pairwise: bool = False


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(inputs: Array, targets: Array, num_boxes: Array,
                       alpha: float = 0.25, gamma: float = 2.0) -> Array:
    """segmentation.py:134-159 — mean over dim 1, sum over rest, / num_boxes."""
    prob = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean(axis=1).sum() / num_boxes


def dice_coefficient(x: Array, target: Array) -> Array:
    """segmentation.py:203-211 — per-instance dice distance over dim0 instances."""
    eps = 1e-5
    n = x.shape[0]
    xf = x.reshape(n, -1)
    tf = target.reshape(n, -1)
    inter = (xf * tf).sum(axis=1)
    union = (xf**2).sum(axis=1) + (tf**2).sum(axis=1) + eps
    return 1.0 - 2.0 * inter / union


def masked_ce_loss(inputs: Array, weights: Array, masks: Array,
                   box_regions: Optional[Array] = None,
                   alpha: float = 0.7, beta: float = 0.3, thres: float = 0.5
                   ) -> Array:
    """segmentation.py:173-200 (incl. the sigmoid-then-BCEwithlogits quirk)."""
    w = jnp.clip(weights, beta, alpha)
    w = jnp.abs(w - thres)
    w = (w - w.min()) / (w.max() - w.min() + 1e-5)
    if box_regions is not None:
        w = jnp.where(box_regions == 0, 1.0, w)
    x = jax.nn.sigmoid(inputs)
    return _bce_with_logits(x * w, masks * w).mean()


def proj_loss(inputs: Array, box_regions: Array, masks: Array,
              with_mean_term: bool = True) -> Array:
    """Box-projection dice (segmentation.py:252-276). inputs: (B, T, H, W) logits."""
    x = jax.nn.sigmoid(inputs)
    loss_y = dice_coefficient(x.max(axis=2, keepdims=True), box_regions.max(axis=2, keepdims=True))
    loss_x = dice_coefficient(x.max(axis=3, keepdims=True), box_regions.max(axis=3, keepdims=True))
    loss_max = (loss_y + loss_x).mean()
    loss_y = dice_coefficient(x.mean(axis=2, keepdims=True), masks.mean(axis=2, keepdims=True))
    loss_x = dice_coefficient(x.mean(axis=3, keepdims=True), masks.mean(axis=3, keepdims=True))
    loss_mean = (loss_y + loss_x).mean()
    return loss_max + 0.1 * loss_mean if with_mean_term else loss_max


def _length_regularization(mask_score: Array) -> Array:
    """Total-variation curve length (segmentation.py:278-282). (N, C, H, W)."""
    gh = jnp.abs(mask_score[:, :, 1:, :] - mask_score[:, :, :-1, :])
    gw = jnp.abs(mask_score[:, :, :, 1:] - mask_score[:, :, :, :-1])
    return gh.sum(axis=(1, 2, 3)) + gw.sum(axis=(1, 2, 3))


def levelset_loss(mask_logits: Array, targets: Array, box_mask: Array) -> Array:
    """Chan–Vese level-set (segmentation.py:285-315).

    mask_logits: (N, 1, H, W); targets: (N, C, H, W); box_mask: (N, 1, H, W).
    """
    fg = jax.nn.sigmoid(mask_logits)
    scores = jnp.concatenate([fg, 1.0 - fg], axis=1)          # (N, 2, H, W)
    pixel_num = jnp.clip(box_mask.sum(axis=(1, 2, 3)), 1.0, None)
    phi = scores * box_mask
    tgt = targets * box_mask

    sf = phi[:, 0:1]
    sb = phi[:, 1:2]
    interior = (sf * tgt).sum(axis=(2, 3)) / jnp.clip(sf.sum(axis=(2, 3)), 1e-5, None)
    exterior = (sb * tgt).sum(axis=(2, 3)) / jnp.clip(sb.sum(axis=(2, 3)), 1e-5, None)
    region = (tgt - interior[..., None, None]) ** 2 * sf + (tgt - exterior[..., None, None]) ** 2 * sb
    region = region.sum(axis=(1, 2, 3)) / targets.shape[1]
    length = 1e-5 * _length_regularization(phi)
    return ((region + length) / pixel_num).mean()


def box_region_mask(boxes_xyxy_norm: Array, im_h: int, im_w: int, sizes: Array) -> Array:
    """Rasterize normalized boxes into binary region masks (segmentation.py:223-237).

    boxes_xyxy_norm: (N, 4) normalized to the *unpadded* image size; sizes: (N, 2)
    as (h, w) actual image size; canvas is the padded (im_h, im_w).
    """
    hw = sizes.astype(jnp.float32)
    scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1)
    b = (boxes_xyxy_norm * scale).astype(jnp.int32).astype(jnp.float32)  # trunc toward 0
    ys = jnp.arange(im_h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(im_w, dtype=jnp.float32)[None, None, :]
    inside = (
        (ys >= b[:, 1, None, None]) & (ys < b[:, 3, None, None])
        & (xs >= b[:, 0, None, None]) & (xs < b[:, 2, None, None])
    )
    nonempty = ((b[:, 3] - b[:, 1]) > 0) & ((b[:, 2] - b[:, 0]) > 0)
    return inside.astype(jnp.float32) * nonempty[:, None, None].astype(jnp.float32)


def compute_criterion(
    cfg: CriterionConfig,
    weight_dict: Dict[str, float],
    outputs: Dict[str, Array],
    targets: Dict[str, Array],
    step: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """Full loss over main + aux decoder layers (criterion.py:213-254).

    outputs: the train-branch dict from OCPG.__call__ —
      outputs_class/coord (L,B,T,Q,*), matched (L,B),
      pred_masks_layers (L,B,T,H,W), pred_masks_low_layers (L,B,T,H2,W2),
      ls_features (B,T,H2,W2,12).
    targets: labels (B,T), boxes (B,T,4), valid (B,T), masks (B,T,H,W),
      weights/heatmaps (B,T,H,W), weak_masks (B,T,H,W), size (B,2).
    """
    num_boxes = jnp.clip(targets["valid"].astype(jnp.float32).sum(), 1.0, None)
    ldec = outputs["outputs_class"].shape[0]

    # One vmapped body over the decoder-layer axis instead of a Python loop
    # (reference criterion.py:241-252 loops per aux layer): the elementwise
    # loss work batches into (L, ...) fusions — fewer, larger kernels on TPU.
    # Numerically identical to the unrolled loop.
    def layer_losses(cls_l, coord_l, matched, pm_l, pml_l):
        out = {"loss_ce": loss_labels(cfg, cls_l, targets["labels"],
                                      targets["valid"], matched, num_boxes)}
        boxes_sel = jnp.take_along_axis(
            coord_l, matched[:, None, None, None], axis=2)[:, :, 0]
        out["loss_bbox"], out["loss_giou"] = loss_boxes(
            boxes_sel, targets["boxes"], num_boxes)
        out.update(loss_masks(
            cfg, pm_l, pml_l, outputs["ls_features"], targets["weights"],
            targets["weak_masks"], targets["boxes"], targets["size"], step))
        return out

    per_layer = jax.vmap(layer_losses)(
        outputs["outputs_class"], outputs["outputs_coord"], outputs["matched"],
        outputs["pred_masks_layers"], outputs["pred_masks_low_layers"])

    losses: Dict[str, Array] = {}
    for lvl in range(ldec):
        suffix = "" if lvl == ldec - 1 else f"_{lvl}"
        for k, v in per_layer.items():
            losses[f"{k}{suffix}"] = v[lvl]

    total = sum(losses[k] * weight_dict[k] for k in losses if k in weight_dict)
    return total, losses


def loss_labels(cfg: CriterionConfig, pred_logits: Array, tgt_labels: Array,
                tgt_valid: Array, matched_q: Array, num_boxes: Array) -> Array:
    """criterion.py:46-82. pred_logits: (B, T, Q, K)."""
    b, t, q, k = pred_logits.shape
    logits = pred_logits.reshape(b, t * q, k).astype(jnp.float32)
    # positive slots: (frame valid) & (query == matched)
    qs = jnp.arange(q)[None, None, :]
    pos = (tgt_valid[:, :, None] > 0) & (qs == matched_q[:, None, None])  # (B,T,Q)
    if cfg.num_classes == 1:
        cls = jnp.zeros((b, t), dtype=jnp.int32)
    else:
        cls = tgt_labels.astype(jnp.int32)
    onehot = jax.nn.one_hot(cls, k)[:, :, None, :] * pos[..., None]       # (B,T,Q,K)
    onehot = onehot.reshape(b, t * q, k)
    return sigmoid_focal_loss(logits, onehot, num_boxes, alpha=cfg.focal_alpha) * (t * q)


def loss_boxes(pred_boxes_matched: Array, tgt_boxes: Array, num_boxes: Array
               ) -> Tuple[Array, Array]:
    """criterion.py:84-107. pred_boxes_matched/tgt_boxes: (B, T, 4) cxcywh."""
    src = pred_boxes_matched.reshape(-1, 4).astype(jnp.float32)
    tgt = tgt_boxes.reshape(-1, 4).astype(jnp.float32)
    l1 = jnp.abs(src - tgt).sum() / num_boxes
    giou = generalized_box_iou_aligned(box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(tgt))
    return l1, (1.0 - giou).sum() / num_boxes


def loss_masks(
    cfg: CriterionConfig,
    pred_masks: Array,       # (B, T, H, W) matched final masks (logits, full res)
    pred_masks_low: Array,   # (B, T, H/2, W/2) matched patch masks (logits)
    ls_features: Array,      # (B, T, H/2, W/2, 12) level-set targets [img3, feat8, sim1]
    tgt_heatmap: Array,      # (B, T, H, W) pseudo heatmaps ("weights")
    tgt_weakmask: Array,     # (B, T, H, W) pseudo masks
    tgt_boxes: Array,        # (B, T, 4) cxcywh normalized
    sizes: Array,            # (B, 2) actual (h, w)
    step: Array,             # scalar iteration counter (for the warmup)
) -> Dict[str, Array]:
    b, t, im_h, im_w = pred_masks.shape
    s_lo = cfg.mask_out_stride_low
    st_lo = s_lo // 2

    heat_low = tgt_heatmap[:, :, st_lo::s_lo, st_lo::s_lo]
    weak_low = tgt_weakmask[:, :, st_lo::s_lo, st_lo::s_lo]

    boxes_xyxy = box_cxcywh_to_xyxy(tgt_boxes.reshape(-1, 4))
    sizes_bt = jnp.repeat(sizes, t, axis=0)
    region = box_region_mask(boxes_xyxy, im_h, im_w, sizes_bt).reshape(b, t, im_h, im_w)
    region_low = region[:, :, st_lo::s_lo, st_lo::s_lo]

    weak = tgt_weakmask * region
    weak_low = weak_low * region_low

    warmup = jnp.minimum(step.astype(jnp.float32) / cfg.lst_warmup_iters, 1.0)

    lm = masked_ce_loss(pred_masks.astype(jnp.float32), tgt_heatmap, weak, region)
    lm_low = masked_ce_loss(pred_masks_low.astype(jnp.float32), heat_low, weak_low, region_low)

    # level-set at 1/2 res; drop the sim-map channel (criterion.py:175)
    from ..ops.image import bilinear_resize, nearest_resize

    lh, lw = ls_features.shape[2], ls_features.shape[3]
    src_scaled = bilinear_resize(
        pred_masks.reshape(b * t, im_h, im_w, 1).astype(jnp.float32), (lh, lw), align_corners=True
    )
    region_scaled = nearest_resize(region.reshape(b * t, im_h, im_w, 1), (lh, lw))
    lst_tgt = ls_features[..., :-1].reshape(b * t, lh, lw, -1)

    # NCHW views for the level-set math
    src_nchw = src_scaled.transpose(0, 3, 1, 2)
    src_low_nchw = pred_masks_low.reshape(b * t, lh, lw, 1).transpose(0, 3, 1, 2).astype(jnp.float32)
    region_nchw = region_scaled.transpose(0, 3, 1, 2)
    tgt_nchw = lst_tgt.transpose(0, 3, 1, 2).astype(jnp.float32)

    lst = levelset_loss(src_nchw, tgt_nchw, region_nchw)
    lst_low = levelset_loss(src_low_nchw, tgt_nchw, region_nchw)

    out = {
        "loss_proj": proj_loss(pred_masks.astype(jnp.float32), region, weak, with_mean_term=True),
        "loss_mask": (1.0 - warmup) * lm,
        "loss_lst": warmup * lst,
        "loss_proj_low": proj_loss(pred_masks_low.astype(jnp.float32), region_low, weak_low, with_mean_term=True),
        "loss_mask_low": (1.0 - warmup) * lm_low,
        "loss_lst_low": warmup * lst_low,
    }
    if cfg.pairwise:
        # opt-in BoxInst pairwise terms at the 1/2-res mask scale; the color
        # source is the ls_features image channels (normalized RGB at the
        # same scale) — see models/pairwise.py for the upstream provenance
        from .pairwise import pairwise_losses

        out.update(pairwise_losses(
            pred_masks_low.astype(jnp.float32), ls_features[..., :3],
            region_low))
    return out
