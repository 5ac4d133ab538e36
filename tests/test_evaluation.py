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


def test_a2d_map_matches_cocoeval_analytic():
    """Hand-derived COCOeval(useCats=0) golden: 3 images, known IoUs/scores.

    img0: perfect pred (IoU 1.0, score .9); img1: subset pred (IoU .6, score
    .8); img2: disjoint pred (IoU 0, score .7).  COCOeval's 101-point
    step-function accumulate gives AP = 67/101 for thr in {.5,.55,.6} and
    34/101 for thr in {.65..95}; mAP = 439/1010.
    """
    import numpy as np

    from ocpg_tpu.evaluation.a2d_metrics import evaluate_a2d
    from ocpg_tpu.evaluation.rle import rle_encode

    def mk(rows_on, cols=slice(None)):
        m = np.zeros((10, 10), np.uint8)
        m[rows_on, cols] = 1
        return rle_encode(m)

    gt = mk(slice(0, 5))                       # 50 px
    pred0 = mk(slice(0, 5))                    # IoU 1.0
    pred1 = mk(slice(0, 3))                    # 30 px subset -> IoU .6
    pred2 = mk(slice(7, 9))                    # 20 px disjoint -> IoU 0

    preds = [
        {"image_id": "a", "score": 0.9, "rle": pred0},
        {"image_id": "b", "score": 0.8, "rle": pred1},
        {"image_id": "c", "score": 0.7, "rle": pred2},
    ]
    gts = [{"image_id": k, "rle": gt} for k in ("a", "b", "c")]
    out = evaluate_a2d(preds, gts)

    np.testing.assert_allclose(out["AP50"], 67 / 101)
    np.testing.assert_allclose(out["mAP 0.5:0.95"], (3 * 67 + 7 * 34) / 1010)
    # reference P@K semantics: (inter+eps)/(union+eps) > thr, so the exact-0.6
    # IoU counts at the 0.6 threshold (a2d_eval.py:26-33,52-55)
    np.testing.assert_allclose(out["P@0.5"], 2 / 3)
    np.testing.assert_allclose(out["P@0.6"], 2 / 3)
    np.testing.assert_allclose(out["P@0.7"], 1 / 3)
    np.testing.assert_allclose(out["overall_iou"], 80 / 170)
    np.testing.assert_allclose(out["mean_iou"], (1.0 + 0.6 + 0.0) / 3, rtol=1e-6)


def test_a2d_map_step_function_not_interpolated():
    """One TP then one FP on the same image must NOT inflate AP by linear
    interpolation between recall points (COCOeval uses a step lookup)."""
    import numpy as np

    from ocpg_tpu.evaluation.a2d_metrics import evaluate_a2d
    from ocpg_tpu.evaluation.rle import rle_encode

    m = np.zeros((8, 8), np.uint8)
    m[:4] = 1
    good = rle_encode(m)
    bad = rle_encode(np.zeros((8, 8), np.uint8))
    preds = [
        {"image_id": "a", "score": 0.9, "rle": good},
        {"image_id": "b", "score": 0.8, "rle": bad},
    ]
    gts = [{"image_id": k, "rle": good} for k in ("a", "b")]
    out = evaluate_a2d(preds, gts)
    # recall .5 at precision 1, then FP: AP = 51/101 at every threshold
    np.testing.assert_allclose(out["mAP 0.5:0.95"], 51 / 101)
