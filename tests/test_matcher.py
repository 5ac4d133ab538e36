"""Matcher parity vs a torch replica of the reference assignment
(matcher.py:74-171): per-video argmin over queries of
class/box/giou/mask-focal/mask-dice costs."""
import numpy as np
import pytest

import jax.numpy as jnp

from ocpg_tpu.models.matcher import MatcherConfig, match

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_reference_match(cfg, logits, boxes, masks, t_labels, t_boxes, t_masks, t_valid):
    """Direct translation of the reference's cost computation."""
    from scipy.optimize import linear_sum_assignment  # unused, argmin instead

    bs, nf, nq, _ = logits.shape
    start = cfg.mask_out_stride // 2
    tm = torch.from_numpy(t_masks)[:, :, start::cfg.mask_out_stride, start::cfg.mask_out_stride]
    out = []
    for i in range(bs):
        prob = torch.from_numpy(logits[i]).sigmoid()
        cost_class = []
        for t in range(nf):
            if t_valid[i, t] == 0:
                continue
            p = prob[t]
            alpha, gamma = 0.25, 2.0
            neg = (1 - alpha) * (p**gamma) * (-(1 - p + 1e-8).log())
            pos = alpha * ((1 - p) ** gamma) * (-(p + 1e-8).log())
            cost_class.append(pos[:, [0]] - neg[:, [0]])
        cost_class = torch.stack(cost_class).mean(0)

        cost_bbox, cost_giou = [], []
        ob = torch.from_numpy(boxes[i])
        tb = torch.from_numpy(t_boxes[i])
        for t in range(nf):
            cost_bbox.append(torch.cdist(ob[t], tb[t].unsqueeze(0), p=1))
            cost_giou.append(-_giou(_xyxy(ob[t]), _xyxy(tb[t].unsqueeze(0))))
        cost_bbox = torch.stack(cost_bbox).mean(0)
        cost_giou = torch.stack(cost_giou).mean(0)

        om = torch.from_numpy(masks[i]).transpose(0, 1)  # (q, t, h, w)
        gm = tm[i].unsqueeze(0)
        cost_mask = _focal_coef(om, gm)
        cost_dice = -_dice_coef(om, gm)

        C = (cfg.cost_class * cost_class + cfg.cost_bbox * cost_bbox
             + cfg.cost_giou * cost_giou + cfg.cost_mask * cost_mask
             + cfg.cost_dice * cost_dice)
        out.append(int(C.min(dim=0)[1]))
    return np.asarray(out)


def _xyxy(b):
    cx, cy, w, h = b.unbind(-1)
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _giou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    iou = inter / union.clamp(min=1e-6)
    lt2 = torch.min(a[:, None, :2], b[None, :, :2])
    rb2 = torch.max(a[:, None, 2:], b[None, :, 2:])
    wh2 = (rb2 - lt2).clamp(min=0)
    area = wh2[..., 0] * wh2[..., 1]
    return iou - (area - union) / area.clamp(min=1e-6)


def _focal_coef(inputs, targets, alpha=0.25, gamma=2.0):
    n, m = len(inputs), len(targets)
    inp = inputs.flatten(1).unsqueeze(1).expand(-1, m, -1)
    tgt = targets.flatten(1).unsqueeze(0).expand(n, -1, -1).float()
    prob = inp.sigmoid()
    ce = F.binary_cross_entropy_with_logits(inp, tgt, reduction="none")
    p_t = prob * tgt + (1 - prob) * (1 - tgt)
    coef = ce * ((1 - p_t) ** gamma)
    coef = (alpha * tgt + (1 - alpha) * (1 - tgt)) * coef
    return coef.mean(2)


def _dice_coef(inputs, targets):
    inp = inputs.sigmoid().flatten(1).unsqueeze(1)
    tgt = targets.flatten(1).unsqueeze(0).float()
    num = 2 * (inp * tgt).sum(2)
    den = inp.sum(-1) + tgt.sum(-1)
    return (num + 1) / (den + 1)


def test_matcher_matches_reference(rng):
    b, t, q, h, w = 3, 2, 5, 16, 16
    cfg = MatcherConfig()
    logits = rng.standard_normal((b, t, q, 1)).astype(np.float32)
    boxes = rng.random((b, t, q, 4)).astype(np.float32) * 0.5 + 0.25
    masks = rng.standard_normal((b, t, q, h // 2, w // 2)).astype(np.float32)
    t_labels = np.zeros((b, t), np.int32)
    t_boxes = rng.random((b, t, 4)).astype(np.float32) * 0.5 + 0.25
    t_masks = (rng.random((b, t, h, w)) > 0.5).astype(np.float32)
    t_valid = np.ones((b, t), np.int32)
    t_valid[1, 0] = 0  # one invalid frame

    expected = torch_reference_match(cfg, logits, boxes, masks, t_labels,
                                     t_boxes, t_masks, t_valid)
    got = np.asarray(match(cfg, jnp.asarray(logits), jnp.asarray(boxes),
                           jnp.asarray(masks), jnp.asarray(t_labels),
                           jnp.asarray(t_boxes), jnp.asarray(t_masks),
                           jnp.asarray(t_valid)))
    np.testing.assert_array_equal(got, expected)
