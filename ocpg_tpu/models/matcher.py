"""Per-video query<->target assignment.

Reference: /root/reference/models/matcher.py:42-171.  Despite the name
"HungarianMatcher", each video carries exactly one ground-truth object
(`matcher.py:166-168`), so the assignment is an argmin over queries of the
per-video cost — which we vectorise over the batch in pure jnp (no scipy, no
host round-trip; runs inside the jitted train step under stop_gradient).

Costs (matcher.py:124-164):
  * focal class cost, averaged over *valid* frames only
  * L1 + GIoU box costs, averaged over all frames
  * focal + dice mask costs against GT masks downsampled to 1/2 resolution
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou_aligned, box_area

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    cost_mask: float = 2.0
    cost_dice: float = 5.0
    num_classes: int = 1
    mask_out_stride: int = 2  # matcher.py:71


def _pairwise_giou(out_xyxy: Array, tgt_xyxy: Array) -> Array:
    """generalized_box_iou of (Q,4) x (1,4) -> (Q,) matching util/box_ops.py."""
    area_o = box_area(out_xyxy)
    area_t = box_area(tgt_xyxy)
    lt = jnp.maximum(out_xyxy[:, :2], tgt_xyxy[:, :2])
    rb = jnp.minimum(out_xyxy[:, 2:], tgt_xyxy[:, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    union = area_o + area_t - inter
    iou = inter / jnp.clip(union, 1e-6, None)
    lt2 = jnp.minimum(out_xyxy[:, :2], tgt_xyxy[:, :2])
    rb2 = jnp.maximum(out_xyxy[:, 2:], tgt_xyxy[:, 2:])
    wh2 = jnp.clip(rb2 - lt2, 0.0, None)
    area = wh2[:, 0] * wh2[:, 1]
    return iou - (area - union) / jnp.clip(area, 1e-6, None)


def match(
    cfg: MatcherConfig,
    pred_logits: Array,   # (B, T, Q, K)
    pred_boxes: Array,    # (B, T, Q, 4) cxcywh in [0,1]
    pred_masks: Array,    # (B, T, Q, H2, W2) logits at 1/2 input resolution
    tgt_labels: Array,    # (B, T) int
    tgt_boxes: Array,     # (B, T, 4) cxcywh
    tgt_masks: Array,     # (B, T, H, W) binary, full (padded) input resolution
    tgt_valid: Array,     # (B, T) {0,1}
) -> Array:               # (B,) matched query index
    b, t, q, k = pred_logits.shape
    alpha, gamma = 0.25, 2.0

    # downsample targets to 1/2 res with the reference's offset (matcher.py:107-109)
    start = cfg.mask_out_stride // 2
    tgt_masks_lo = tgt_masks[:, :, start::cfg.mask_out_stride, start::cfg.mask_out_stride]
    tgt_masks_lo = tgt_masks_lo.astype(jnp.float32)

    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    neg_cost = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    pos_cost = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    if cfg.num_classes == 1:
        cost_class_t = pos_cost[..., 0] - neg_cost[..., 0]           # (B, T, Q)
    else:
        cls = jnp.clip(tgt_labels, 0, k - 1)[:, :, None, None]       # (B,T,1,1)
        cost_class_t = jnp.take_along_axis(pos_cost - neg_cost, cls, axis=-1)[..., 0]
    valid_f = tgt_valid.astype(jnp.float32)
    denom = jnp.clip(valid_f.sum(axis=1, keepdims=True), 1.0, None)
    cost_class = (cost_class_t * valid_f[:, :, None]).sum(axis=1) / denom  # (B, Q)

    # box costs: mean over all frames (matcher.py:145-157)
    l1 = jnp.abs(pred_boxes.astype(jnp.float32) - tgt_boxes[:, :, None, :]).sum(-1)  # (B,T,Q)
    cost_bbox = l1.mean(axis=1)
    out_xyxy = box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32))
    tgt_xyxy = box_cxcywh_to_xyxy(tgt_boxes)

    def per_frame_giou(o, tb):  # o: (Q,4), tb: (4,)
        return _pairwise_giou(o, tb[None])

    giou = jax.vmap(jax.vmap(per_frame_giou))(out_xyxy, tgt_xyxy)  # (B,T,Q)
    cost_giou = (-giou).mean(axis=1)

    # mask costs over (T * H2 * W2) flattened pixels (matcher.py:159-160)
    pm = pred_masks.astype(jnp.float32).transpose(0, 2, 1, 3, 4).reshape(b, q, -1)  # (B,Q,THW)
    tm = tgt_masks_lo.reshape(b, 1, -1)                                             # (B,1,THW)
    prob_m = jax.nn.sigmoid(pm)
    ce = jnp.maximum(pm, 0) - pm * tm + jnp.log1p(jnp.exp(-jnp.abs(pm)))
    p_t = prob_m * tm + (1 - prob_m) * (1 - tm)
    focal = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * tm + (1 - alpha) * (1 - tm)
    cost_mask = (alpha_t * focal).mean(axis=-1)                                      # (B,Q)

    num = 2 * (prob_m * tm).sum(-1)
    den = prob_m.sum(-1) + tm.sum(-1)
    cost_dice = -(num + 1) / (den + 1)

    cost = (
        cfg.cost_class * cost_class
        + cfg.cost_bbox * cost_bbox
        + cfg.cost_giou * cost_giou
        + cfg.cost_mask * cost_mask
        + cfg.cost_dice * cost_dice
    )
    return jnp.argmin(cost, axis=-1)  # (B,)
