"""DenseCL-similarity pseudo-label generator (SimModel) — JAX.

Reference: /root/reference/pre_process/sim_model.py — frozen ResNet-101
(DenseCL self-supervised weights) producing layer4 features; two modes:
  * point (:35-65): cosine similarity of the annotated-point feature against
    all layer4 features, min-max normalised into a soft mask.
  * bbox  (:67-134): sample <=256 in-box query pixels on a strided grid, score
    each query's similarity map by x/y max-projection IoU against the box,
    keep the best-scoring map.

TPU-first: queries are padded to a fixed count (jit-stable shapes) and scored
as one batched matmul on the MXU instead of the reference's per-query Python
loop.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.backbone_resnet import build_resnet

MAX_QUERIES = 256


def init_sim_model(rng_key, arch: str = "resnet101", image_hw: Tuple[int, int] = (320, 576)):
    """Create the backbone and init params (load DenseCL weights via
    utils.torch_weights.convert_resnet when available)."""
    model = build_resnet(arch, dilation=False)
    h, w = image_hw
    params = model.init(rng_key, jnp.zeros((1, h, w, 3), jnp.float32))
    return model, params


@functools.partial(jax.jit, static_argnums=(0,))
def _layer4(model, params, x):
    return model.apply(params, x)[-1]  # (B, H/32, W/32, 2048)


def _minmax_rows(attn):
    amin = attn.min(axis=-1, keepdims=True)
    amax = attn.max(axis=-1, keepdims=True)
    # reference normalises as (a - min) / max (sic, sim_model.py:57-59)
    return (attn - amin) / jnp.where(amax == 0, 1.0, amax)


def forward_point(model, params, image: jnp.ndarray, point_xy_norm: Tuple[float, float]
                  ) -> np.ndarray:
    """image: (1, H, W, 3) normalized; point in [0,1] (x, y). Returns (h, w) soft mask."""
    feat = _layer4(model, params, image)            # (1, h, w, c)
    b, h, w, c = feat.shape
    px = int(point_xy_norm[0] * w)
    py = int(point_xy_norm[1] * h)
    px = min(max(px, 0), w - 1)
    py = min(max(py, 0), h - 1)
    keys = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    q = keys[:, py, px]                              # (1, c)
    attn = jnp.einsum("bc,bhwc->bhw", q, keys).reshape(b, -1)
    attn = _minmax_rows(attn)
    return np.asarray(attn.reshape(h, w))


def forward_bbox(model, params, image: jnp.ndarray, box_xyxy_abs: Tuple[float, float, float, float]
                 ) -> np.ndarray:
    """image: (1, H, W, 3); box in image pixels. Returns (h, w) best soft mask."""
    h_ori, w_ori = image.shape[1], image.shape[2]
    feat = _layer4(model, params, image)
    b, h, w, c = feat.shape
    x0 = int(box_xyxy_abs[0] / w_ori * w)
    y0 = int(box_xyxy_abs[1] / h_ori * h)
    x1 = int(box_xyxy_abs[2] / w_ori * w)
    y1 = int(box_xyxy_abs[3] / h_ori * h)
    x0, x1 = max(x0, 0), min(max(x1, x0), w - 1)
    y0, y1 = max(y0, 0), min(max(y1, y0), h - 1)

    # strided in-box grid, <=256 queries (sim_model.py:88-98)
    range_x = list(range(x0, x1 + 1))
    range_y = list(range(y0, y1 + 1))
    i = 1
    while len(range_x) * len(range_y) > MAX_QUERIES:
        range_x = list(range(x0, x1 + 1, i + 1))
        range_y = list(range(y0, y1 + 1, i + 1))
        i += 1
    gx, gy = np.meshgrid(np.asarray(range_x), np.asarray(range_y), indexing="ij")
    locs = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)     # (N, 2) xy
    n = len(locs)
    pad = MAX_QUERIES - n
    locs_p = np.concatenate([locs, np.zeros((pad, 2), locs.dtype)], 0)
    qmask = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)

    keys = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    queries = keys[0, locs_p[:, 1], locs_p[:, 0]]             # (Nmax, c)
    attn = jnp.einsum("nc,hwc->nhw", queries, keys[0]).reshape(MAX_QUERIES, -1)
    attn = _minmax_rows(attn).reshape(MAX_QUERIES, h, w)

    box_mask = np.zeros((h, w), np.float32)
    box_mask[y0:y1, x0:x1] = 1.0
    bm = jnp.asarray(box_mask)
    attn_x = attn.max(axis=-2)                                 # (N, w)
    attn_y = attn.max(axis=-1)                                 # (N, h)
    bx = bm.max(axis=-2)[None]
    by = bm.max(axis=-1)[None]
    score_x = (attn_x * bx).sum(-1) / ((attn_x + bx - attn_x * bx).sum(-1) + 1e-5)
    score_y = (attn_y * by).sum(-1) / ((attn_y + by - attn_y * by).sum(-1) + 1e-5)
    score = (score_x + score_y) / 2 * jnp.asarray(qmask) - (1 - jnp.asarray(qmask))
    best = jnp.argmax(score)
    return np.asarray(attn[best])
