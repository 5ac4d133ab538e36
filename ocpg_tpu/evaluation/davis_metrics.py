"""DAVIS J (region IoU) and F (boundary) measures — pure numpy.

Reference: /root/reference/davis2017/metrics.py — J = IoU (:6-37), F =
boundary f-measure via dilated boundary matching (:40-119).  Implemented from
the published DAVIS evaluation algorithm; cv2 replaces the reference's
hand-rolled bmap rasterisation with an equivalent morphological-gradient
boundary extraction.
"""

from __future__ import annotations

import numpy as np
import cv2


def db_eval_iou(annotation: np.ndarray, segmentation: np.ndarray,
                void_pixels: np.ndarray | None = None) -> np.ndarray:
    """Region similarity J per frame; inputs (T, H, W) or (H, W) binary."""
    assert annotation.shape == segmentation.shape
    ann = annotation > 0.5
    seg = segmentation > 0.5
    if void_pixels is not None:
        valid = void_pixels < 0.5
        ann = ann & valid
        seg = seg & valid
    axis = tuple(range(ann.ndim - 2, ann.ndim))
    inter = (ann & seg).sum(axis=axis).astype(np.float64)
    union = (ann | seg).sum(axis=axis).astype(np.float64)
    j = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    return j


def _boundary(mask: np.ndarray) -> np.ndarray:
    m = (mask > 0.5).astype(np.uint8)
    k = np.ones((3, 3), np.uint8)
    return cv2.morphologyEx(m, cv2.MORPH_GRADIENT, k) > 0


def db_eval_boundary(annotation: np.ndarray, segmentation: np.ndarray,
                     void_pixels: np.ndarray | None = None,
                     bound_th: float = 0.008) -> np.ndarray:
    """Boundary measure F per frame (davis2017/metrics.py:40-119)."""
    ann = np.atleast_3d(annotation.astype(np.float32).T).T if annotation.ndim == 2 else annotation
    seg = np.atleast_3d(segmentation.astype(np.float32).T).T if segmentation.ndim == 2 else segmentation
    if ann.ndim == 2:
        ann, seg = ann[None], seg[None]
    fs = []
    for a, s in zip(ann, seg):
        fs.append(_f_measure_frame(a, s, bound_th))
    return np.asarray(fs)


def _f_measure_frame(ann: np.ndarray, seg: np.ndarray, bound_th: float) -> float:
    h, w = ann.shape
    bound_pix = bound_th if bound_th >= 1 else np.ceil(bound_th * np.linalg.norm([h, w]))
    fg_b = _boundary(seg)
    gt_b = _boundary(ann)
    radius = int(bound_pix)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
    fg_dil = cv2.dilate(fg_b.astype(np.uint8), kernel) > 0
    gt_dil = cv2.dilate(gt_b.astype(np.uint8), kernel) > 0

    gt_match = gt_b & fg_dil
    fg_match = fg_b & gt_dil
    n_fg = fg_b.sum()
    n_gt = gt_b.sum()
    if n_fg == 0 and n_gt > 0:
        return 0.0
    if n_fg > 0 and n_gt == 0:
        return 0.0
    if n_fg == 0 and n_gt == 0:
        return 1.0
    precision = fg_match.sum() / n_fg
    recall = gt_match.sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def mean_recall_decay(per_frame: np.ndarray) -> tuple:
    """(mean, recall@0.5, decay) statistics (davis2017/utils.py:135-162)."""
    m = float(np.nanmean(per_frame))
    recall = float(np.nanmean(per_frame > 0.5))
    n_bins = 4
    ids = np.round(np.linspace(1, len(per_frame), n_bins + 1) + 1e-10) - 1
    ids = ids.astype(np.uint8)
    d_bins = [per_frame[ids[i]:ids[i + 1] + 1] for i in range(n_bins)]
    decay = float(np.nanmean(d_bins[0]) - np.nanmean(d_bins[3])) if len(per_frame) > 3 else 0.0
    return m, recall, decay
