"""DAVIS J (region IoU) and F (boundary) measures — official algorithm, pure numpy.

Reference: /root/reference/davis2017/metrics.py — J = IoU with void-pixel
exclusion (:6-37); F = boundary f-measure (:40-119) computed from 1-pixel
``_seg2bmap`` boundary maps (:122-178, the David Martin half-pixel-offset
convention) dilated with a ``skimage.morphology.disk(bound_pix)`` structuring
element (:84-89).  skimage is not available in this environment, so ``_disk``
vendors the 3-line Euclidean-disk formula; everything else follows the
published algorithm exactly.  Void pixels (palette index 255) are excluded
from J's intersection/union and zeroed out of both masks before boundary
extraction, as in the reference.
"""

from __future__ import annotations

import numpy as np
import cv2


def db_eval_iou(annotation: np.ndarray, segmentation: np.ndarray,
                void_pixels: np.ndarray | None = None) -> np.ndarray:
    """Region similarity J per frame; inputs (T, H, W) or (H, W) binary.

    Void pixels are excluded from both intersection and union
    (davis2017/metrics.py:21-31).
    """
    assert annotation.shape == segmentation.shape, \
        f"shape mismatch: {annotation.shape} vs {segmentation.shape}"
    ann = annotation > 0.5
    seg = segmentation > 0.5
    if void_pixels is not None:
        assert void_pixels.shape == annotation.shape, \
            f"void shape mismatch: {void_pixels.shape} vs {annotation.shape}"
        valid = ~(void_pixels > 0.5)
    else:
        valid = np.ones_like(seg)
    axis = tuple(range(ann.ndim - 2, ann.ndim))
    inter = ((ann & seg) & valid).sum(axis=axis).astype(np.float64)
    union = ((ann | seg) & valid).sum(axis=axis).astype(np.float64)
    j = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    return j


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide binary boundary map, pixels offset 1/2 px toward the
    origin from the true segment boundary (davis2017/metrics.py:122-178,
    the published David Martin / BSDS convention).

    A pixel is boundary iff it differs from its east, south, or south-east
    neighbour — except on the last row (east test only), last column (south
    test only), and the bottom-right corner (never boundary).
    """
    seg = seg > 0.5
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]

    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _disk(radius: float) -> np.ndarray:
    """Euclidean-disk structuring element — ``skimage.morphology.disk``
    equivalent (strict radius), vendored because skimage is absent here
    (davis2017/metrics.py:84 imports it)."""
    L = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(L, L)
    return ((X ** 2 + Y ** 2) <= radius ** 2).astype(np.uint8)


def f_measure(foreground_mask: np.ndarray, gt_mask: np.ndarray,
              void_pixels: np.ndarray | None = None,
              bound_th: float = 0.008) -> float:
    """Boundary F for one frame (davis2017/metrics.py:57-119).

    Boundaries of ``mask & ~void`` are matched within a ``disk(bound_pix)``
    dilation; precision over predicted-boundary pixels, recall over
    GT-boundary pixels.
    """
    assert foreground_mask.ndim == 2
    if void_pixels is not None:
        valid = ~(void_pixels > 0.5)
    else:
        valid = np.ones(foreground_mask.shape, bool)

    bound_pix = bound_th if bound_th >= 1 else \
        np.ceil(bound_th * np.linalg.norm(foreground_mask.shape))

    fg_boundary = _seg2bmap((foreground_mask > 0.5) & valid)
    gt_boundary = _seg2bmap((gt_mask > 0.5) & valid)

    kernel = _disk(bound_pix)
    fg_dil = cv2.dilate(fg_boundary.astype(np.uint8), kernel) > 0
    gt_dil = cv2.dilate(gt_boundary.astype(np.uint8), kernel) > 0

    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil
    n_fg = int(fg_boundary.sum())
    n_gt = int(gt_boundary.sum())

    # Edge-case table from davis2017/metrics.py:100-117.
    if n_fg == 0 and n_gt > 0:
        return 0.0           # precision 1, recall 0
    if n_fg > 0 and n_gt == 0:
        return 0.0           # precision 0, recall 1
    if n_fg == 0 and n_gt == 0:
        return 1.0           # precision 1, recall 1
    precision = fg_match.sum() / n_fg
    recall = gt_match.sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def db_eval_boundary(annotation: np.ndarray, segmentation: np.ndarray,
                     void_pixels: np.ndarray | None = None,
                     bound_th: float = 0.008) -> np.ndarray:
    """Boundary measure F per frame (davis2017/metrics.py:40-54); inputs
    (T, H, W) or (H, W); optional per-frame void masks of the same shape."""
    assert annotation.shape == segmentation.shape
    if void_pixels is not None:
        assert void_pixels.shape == annotation.shape
    if annotation.ndim == 2:
        return np.asarray(
            f_measure(segmentation, annotation, void_pixels, bound_th))
    fs = [
        f_measure(segmentation[t], annotation[t],
                  None if void_pixels is None else void_pixels[t], bound_th)
        for t in range(annotation.shape[0])
    ]
    return np.asarray(fs)
