"""Analytic goldens for CocoEvaluatorLite (COCOeval useCats=0 semantics).

Reference: /root/reference/datasets/coco_eval.py:21-207 (pycocotools
COCOeval wrapper printed by engine.py:256-271).  Every expected value below
is hand-derived from the COCOeval algorithm: greedy score-ordered matching,
101-point interpolated AP with precision envelope and left-searchsorted
recall lookup, area-range gt-ignore, per-maxDet truncation.
"""

import numpy as np
import pytest

from ocpg_tpu.evaluation.coco_eval import CocoEvaluatorLite
from ocpg_tpu.evaluation.rle import rle_encode


def box(x0, y0, x1, y1):
    return np.asarray([x0, y0, x1, y1], np.float64)


def test_bbox_ap_two_images_mixed():
    """img0: perfect dt (0.9) + disjoint FP (0.8); img1: IoU-0.6 dt (0.7).

    thr in {0.5, 0.55, 0.6}: tp order [1, 0, 1] -> envelope pr [1, 2/3, 2/3],
    rc [0.5, 0.5, 1.0] -> AP1 = (51*1 + 50*(2/3))/101.
    thr > 0.6 (7 thresholds): tp [1, 0, 0] -> AP2 = 51/101.
    mAP = (3*AP1 + 7*AP2)/10; AR@100 = (3*1 + 7*0.5)/10 = 0.65.
    """
    gts = [
        {"image_id": 0, "box": box(0, 0, 100, 100)},
        {"image_id": 1, "box": box(0, 0, 100, 100)},
    ]
    dts = [
        {"image_id": 0, "score": 0.9, "box": box(0, 0, 100, 100)},
        {"image_id": 0, "score": 0.8, "box": box(200, 200, 300, 300)},
        {"image_id": 1, "score": 0.7, "box": box(0, 0, 100, 60)},  # IoU 0.6
    ]
    stats = CocoEvaluatorLite("bbox").evaluate(dts, gts)
    ap1 = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    ap2 = 51.0 / 101
    assert stats["AP"] == pytest.approx((3 * ap1 + 7 * ap2) / 10)
    assert stats["AP50"] == pytest.approx(ap1)
    assert stats["AP75"] == pytest.approx(ap2)
    assert stats["AR@100"] == pytest.approx(0.65)
    # all GTs are 100x100 = large; no small/medium gts -> -1 sentinel
    assert stats["AP_large"] == pytest.approx(stats["AP"])
    assert stats["AP_small"] == -1.0 and stats["AP_medium"] == -1.0
    assert stats["AR_small"] == -1.0


def test_bbox_area_range_breakdown():
    """One small (20x20=400 < 32^2) + one large GT, both detected perfectly."""
    gts = [
        {"image_id": 0, "box": box(0, 0, 20, 20)},
        {"image_id": 1, "box": box(0, 0, 100, 100)},
    ]
    dts = [
        {"image_id": 0, "score": 0.9, "box": box(0, 0, 20, 20)},
        {"image_id": 1, "score": 0.8, "box": box(0, 0, 100, 100)},
    ]
    stats = CocoEvaluatorLite("bbox").evaluate(dts, gts)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP_small"] == pytest.approx(1.0)
    assert stats["AP_large"] == pytest.approx(1.0)
    assert stats["AP_medium"] == -1.0
    assert stats["AR@1"] == pytest.approx(1.0)


def test_bbox_maxdets():
    """1 GT; dts: two high-scoring misses then a perfect hit at rank 3.

    AR@1 considers only the top det -> 0.  AR@10 -> 1.
    AP: tp order [0, 0, 1]: rc=[0,0,1], envelope pr=[1/3,1/3,1/3] -> AP=1/3.
    """
    gts = [{"image_id": 0, "box": box(0, 0, 100, 100)}]
    dts = [
        {"image_id": 0, "score": 0.9, "box": box(300, 300, 400, 400)},
        {"image_id": 0, "score": 0.8, "box": box(500, 500, 600, 600)},
        {"image_id": 0, "score": 0.7, "box": box(0, 0, 100, 100)},
    ]
    stats = CocoEvaluatorLite("bbox").evaluate(dts, gts)
    assert stats["AR@1"] == pytest.approx(0.0)
    assert stats["AR@10"] == pytest.approx(1.0)
    assert stats["AR@100"] == pytest.approx(1.0)
    assert stats["AP"] == pytest.approx(1.0 / 3.0)


def test_segm_exact_match():
    gt_mask = np.zeros((32, 32), np.uint8)
    gt_mask[4:24, 4:24] = 1               # area 400 -> small
    off_mask = np.zeros((32, 32), np.uint8)
    off_mask[0:4, 0:4] = 1
    gts = [{"image_id": 0, "rle": rle_encode(gt_mask)}]
    dts = [
        {"image_id": 0, "score": 0.9, "rle": rle_encode(gt_mask)},
        {"image_id": 0, "score": 0.5, "rle": rle_encode(off_mask)},
    ]
    stats = CocoEvaluatorLite("segm").evaluate(dts, gts)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP_small"] == pytest.approx(1.0)
    assert stats["AP_large"] == -1.0
    assert stats["AR@1"] == pytest.approx(1.0)


def test_gt_ignore_rematch_semantics():
    """A dt matched to an area-ignored gt is ignored (neither tp nor fp):
    in the 'small' range the large gt is ignored, its perfect dt is ignored,
    and the remaining small-gt dt still scores AP_small = 1."""
    gts = [
        {"image_id": 0, "box": box(0, 0, 100, 100)},   # large -> ignored in small
        {"image_id": 0, "box": box(200, 0, 220, 20)},  # small
    ]
    dts = [
        {"image_id": 0, "score": 0.9, "box": box(0, 0, 100, 100)},
        {"image_id": 0, "score": 0.8, "box": box(200, 0, 220, 20)},
    ]
    stats = CocoEvaluatorLite("bbox").evaluate(dts, gts)
    assert stats["AP_small"] == pytest.approx(1.0)
    assert stats["AP_large"] == pytest.approx(1.0)
    assert stats["AP"] == pytest.approx(1.0)
