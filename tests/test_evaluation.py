"""Tests for RLE codec and DAVIS/A2D metrics."""
import numpy as np

from ocpg_tpu.evaluation import db_eval_boundary, db_eval_iou, rle_decode, rle_encode
from ocpg_tpu.evaluation.a2d_metrics import evaluate_a2d


def test_rle_roundtrip(rng):
    for _ in range(5):
        m = (rng.random((37, 53)) > 0.6).astype(np.uint8)
        rle = rle_encode(m)
        back = rle_decode(rle)
        np.testing.assert_array_equal(m, back)


def test_rle_empty_and_full():
    z = np.zeros((10, 10), np.uint8)
    o = np.ones((10, 10), np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(z)), z)
    np.testing.assert_array_equal(rle_decode(rle_encode(o)), o)


def test_davis_j_perfect_and_disjoint():
    a = np.zeros((2, 20, 20))
    a[:, 5:15, 5:15] = 1
    np.testing.assert_allclose(db_eval_iou(a, a), [1.0, 1.0])
    b = np.zeros_like(a)
    b[:, 0:3, 0:3] = 1
    np.testing.assert_allclose(db_eval_iou(a, b), [0.0, 0.0])


def test_davis_f_perfect():
    a = np.zeros((1, 40, 40))
    a[:, 10:30, 10:30] = 1
    f = db_eval_boundary(a, a)
    np.testing.assert_allclose(f, [1.0])


def test_davis_f_shifted_lower():
    a = np.zeros((1, 40, 40))
    a[:, 10:30, 10:30] = 1
    b = np.zeros_like(a)
    b[:, 12:32, 12:32] = 1
    f = db_eval_boundary(a, b)
    assert 0.0 < f[0] < 1.0


def test_a2d_eval_perfect():
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 1
    preds = [{"image_id": "v1", "score": 0.9, "rle": rle_encode(m)}]
    gts = [{"image_id": "v1", "rle": rle_encode(m)}]
    out = evaluate_a2d(preds, gts)
    assert out["mAP 0.5:0.95"] > 0.99
    assert out["P@0.5"] == 1.0
    assert out["overall_iou"] == 1.0


def test_a2d_eval_half_wrong():
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 1
    wrong = np.zeros_like(m)
    wrong[0:2, 0:2] = 1
    preds = [
        {"image_id": "v1", "score": 0.9, "rle": rle_encode(m)},
        {"image_id": "v2", "score": 0.8, "rle": rle_encode(wrong)},
    ]
    gts = [{"image_id": "v1", "rle": rle_encode(m)},
           {"image_id": "v2", "rle": rle_encode(m)}]
    out = evaluate_a2d(preds, gts)
    assert out["P@0.5"] == 0.5
    assert 0.4 < out["mAP 0.5:0.95"] < 0.6
