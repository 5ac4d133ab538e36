"""Box utilities (cxcywh <-> xyxy, IoU, GIoU).

Reference: /root/reference/util/box_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b):
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou_aligned(a, b):
    """Elementwise IoU of aligned boxes (..., 4) xyxy. Returns (iou, union)."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / jnp.clip(union, 1e-6, None), union


def generalized_box_iou_aligned(a, b):
    """Elementwise GIoU of aligned boxes (..., 4) xyxy."""
    iou, union = box_iou_aligned(a, b)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.clip(area, 1e-6, None)
