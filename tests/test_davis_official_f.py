"""Official DAVIS boundary-F parity vs an independent brute-force oracle.

The production scorer (ocpg_tpu/evaluation/davis_metrics.py) implements the
published DAVIS algorithm: ``_seg2bmap`` 1-pixel boundaries (the David
Martin half-pixel-offset convention, /root/reference/davis2017/metrics.py:122-178)
dilated with a Euclidean ``disk(bound_pix)`` (:84-89), with void pixels zeroed
out of both masks before boundary extraction (:81-82) and excluded from J's
intersection/union (:28-31).

The oracle here recomputes the same published algorithm with per-pixel Python
loops — a completely independent code path (no cv2, no vectorised slicing).
Exact agreement (all-integer arithmetic) is asserted on adversarial fixtures
including the shifted-rectangle cases where the round-2 morphological-gradient
approximation deviated by up to 0.20 absolute F.
"""

import numpy as np
import pytest

from ocpg_tpu.evaluation.davis_metrics import (
    _disk, _seg2bmap, db_eval_boundary, db_eval_iou, f_measure)


# ---------------------------------------------------------------- oracle ---

def oracle_seg2bmap(seg):
    """Per-pixel loop implementation of the published bmap convention:
    a pixel is boundary iff it differs from its east/south/south-east
    neighbour; last row uses the east test only, last column the south test
    only, bottom-right corner is never boundary."""
    seg = seg > 0.5
    h, w = seg.shape
    b = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            p = seg[y, x]
            e = seg[y, x + 1] if x + 1 < w else False
            s = seg[y + 1, x] if y + 1 < h else False
            se = seg[y + 1, x + 1] if (y + 1 < h and x + 1 < w) else False
            if y == h - 1 and x == w - 1:
                b[y, x] = False
            elif y == h - 1:
                b[y, x] = p ^ e
            elif x == w - 1:
                b[y, x] = p ^ s
            else:
                b[y, x] = (p ^ e) | (p ^ s) | (p ^ se)
    return b


def oracle_dilate_disk(b, radius):
    """Union-of-translates dilation with a Euclidean disk, per-pixel loops."""
    h, w = b.shape
    r = int(np.ceil(radius))
    offsets = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)
               if dy * dy + dx * dx <= radius * radius]
    out = np.zeros_like(b)
    for y in range(h):
        for x in range(w):
            if b[y, x]:
                for dy, dx in offsets:
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        out[yy, xx] = True
    return out


def oracle_f(pred, gt, void=None, bound_th=0.008):
    valid = np.ones(pred.shape, bool) if void is None else ~(void > 0.5)
    bound_pix = bound_th if bound_th >= 1 else \
        np.ceil(bound_th * np.linalg.norm(pred.shape))
    fg_b = oracle_seg2bmap((pred > 0.5) & valid)
    gt_b = oracle_seg2bmap((gt > 0.5) & valid)
    fg_dil = oracle_dilate_disk(fg_b, bound_pix)
    gt_dil = oracle_dilate_disk(gt_b, bound_pix)
    n_fg, n_gt = int(fg_b.sum()), int(gt_b.sum())
    if n_fg == 0 and n_gt > 0:
        return 0.0
    if n_fg > 0 and n_gt == 0:
        return 0.0
    if n_fg == 0 and n_gt == 0:
        return 1.0
    precision = (fg_b & gt_dil).sum() / n_fg
    recall = (gt_b & fg_dil).sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def oracle_j(ann, gt_seg, void=None):
    a, s = ann > 0.5, gt_seg > 0.5
    valid = np.ones(a.shape, bool) if void is None else ~(void > 0.5)
    inter = ((a & s) & valid).sum()
    union = ((a | s) & valid).sum()
    return 1.0 if union == 0 else inter / union


def rect(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.float32)
    m[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)] = 1
    return m


# -------------------------------------------------------------- fixtures ---

def shifted_rect_cases():
    """30x40 rectangles under small shifts — the cases where round-2's
    approximation deviated from the reference by up to 0.20 absolute."""
    cases = []
    for H, W in ((100, 100), (48, 64), (480, 910)):
        base = rect(H, W, 10, 40, 10, 50)
        for dy, dx in ((0, -3), (0, -1), (-3, 0), (2, 2), (5, -5), (0, 0), (1, 0)):
            cases.append((f"rect{H}x{W}_shift{dy}_{dx}", base,
                          rect(H, W, 10 + dy, 40 + dy, 10 + dx, 50 + dx)))
    return cases


def random_blob_cases():
    rng = np.random.default_rng(7)
    cases = []
    for i, density in enumerate((0.2, 0.5, 0.8)):
        gt = (rng.random((37, 53)) < density).astype(np.float32)
        pred = (rng.random((37, 53)) < density).astype(np.float32)
        cases.append((f"random_{i}", gt, pred))
    return cases


def edge_cases():
    H, W = 32, 48
    return [
        ("empty_pred", rect(H, W, 5, 20, 5, 20), np.zeros((H, W), np.float32)),
        ("empty_gt", np.zeros((H, W), np.float32), rect(H, W, 5, 20, 5, 20)),
        ("both_empty", np.zeros((H, W), np.float32), np.zeros((H, W), np.float32)),
        ("full_frame", np.ones((H, W), np.float32), np.ones((H, W), np.float32)),
        ("edge_touching", rect(H, W, 0, H, 0, 10), rect(H, W, 0, H, 2, 12)),
        ("bottom_right_corner", rect(H, W, H - 8, H, W - 8, W),
         rect(H, W, H - 10, H, W - 10, W)),
        ("single_pixel", rect(H, W, 5, 6, 5, 6), rect(H, W, 7, 8, 7, 8)),
        ("thin_line", rect(H, W, 10, 11, 0, W), rect(H, W, 12, 13, 0, W)),
    ]


ALL_CASES = shifted_rect_cases() + random_blob_cases() + edge_cases()


# ----------------------------------------------------------------- tests ---

def test_disk_matches_skimage_formula():
    # skimage.morphology.disk(2) golden (strict radius)
    expected = np.array([
        [0, 0, 1, 0, 0],
        [0, 1, 1, 1, 0],
        [1, 1, 1, 1, 1],
        [0, 1, 1, 1, 0],
        [0, 0, 1, 0, 0]], np.uint8)
    np.testing.assert_array_equal(_disk(2), expected)
    assert _disk(0).shape == (1, 1) and _disk(0)[0, 0] == 1
    # float radius from np.ceil works identically
    np.testing.assert_array_equal(_disk(2.0), expected)


@pytest.mark.parametrize("name,gt,pred", ALL_CASES, ids=[c[0] for c in ALL_CASES])
def test_seg2bmap_matches_oracle(name, gt, pred):
    np.testing.assert_array_equal(_seg2bmap(gt), oracle_seg2bmap(gt))
    np.testing.assert_array_equal(_seg2bmap(pred), oracle_seg2bmap(pred))


@pytest.mark.parametrize("name,gt,pred", ALL_CASES, ids=[c[0] for c in ALL_CASES])
def test_f_measure_matches_oracle_exactly(name, gt, pred):
    got = f_measure(pred, gt)
    want = oracle_f(pred, gt)
    assert abs(got - want) < 1e-12, f"{name}: {got} vs oracle {want}"


def test_f_measure_with_void_matches_oracle():
    rng = np.random.default_rng(3)
    H, W = 60, 80
    gt = rect(H, W, 10, 40, 10, 50)
    pred = rect(H, W, 12, 42, 8, 48)
    for trial in range(4):
        void = np.zeros((H, W), np.float32)
        y, x = rng.integers(0, H - 12), rng.integers(0, W - 12)
        void[y:y + 12, x:x + 12] = 1
        got = f_measure(pred, gt, void)
        want = oracle_f(pred, gt, void)
        assert abs(got - want) < 1e-12
        # void must actually matter when it covers boundary pixels
    full_void = np.ones((H, W), np.float32)
    assert f_measure(pred, gt, full_void) == 1.0   # both boundaries empty


def test_iou_with_void_matches_oracle():
    H, W = 40, 40
    gt = rect(H, W, 5, 25, 5, 25)
    pred = rect(H, W, 10, 30, 10, 30)
    void = rect(H, W, 5, 15, 5, 15)
    got = db_eval_iou(gt, pred, void)
    assert abs(float(got) - oracle_j(gt, pred, void)) < 1e-12
    # hand check: without void inter=15*15=225, union=2*400-225=575
    np.testing.assert_allclose(db_eval_iou(gt, pred), 225 / 575)
    # with void: removed from inter: rows/cols 10:15 -> 5*5=25 ->200
    # union loses the 10x10 void block entirely (all inside gt)
    np.testing.assert_allclose(got, 200 / 475)


def test_db_eval_boundary_3d_per_frame_void():
    H, W = 40, 48
    gt = np.stack([rect(H, W, 5, 25, 5, 25), rect(H, W, 6, 26, 6, 26)])
    pred = np.stack([rect(H, W, 7, 27, 5, 25), rect(H, W, 6, 26, 6, 26)])
    void = np.zeros_like(gt)
    void[0, 0:10, 0:10] = 1
    out = db_eval_boundary(gt, pred, void)
    assert out.shape == (2,)
    assert abs(out[0] - oracle_f(pred[0], gt[0], void[0])) < 1e-12
    assert out[1] == 1.0


def _write_davis_tree(root, gt, task_dirs=("Annotations",)):
    """Minimal DAVIS tree: gt is {seq: (T, H, W) uint8 id map}."""
    from PIL import Image

    palette = [0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * (252 * 3 - 9) + [255, 255, 255]
    for d in task_dirs:
        for seq, frames in gt.items():
            (root / d / seq).mkdir(parents=True, exist_ok=True)
            for t in range(frames.shape[0]):
                img = Image.fromarray(frames[t], mode="P")
                img.putpalette(palette)
                img.save(root / d / seq / f"{t:05d}.png")
    (root / "ImageSets" / "2017").mkdir(parents=True, exist_ok=True)
    with open(root / "ImageSets" / "2017" / "val.txt", "w") as f:
        f.write("\n".join(gt) + "\n")


def test_evaluate_davis_semisupervised_drops_edge_frames(tmp_path):
    """Semi-supervised protocol: first/last frames are stripped before
    scoring (davis2017/evaluation.py:84-85), and void masks are NOT applied
    (evaluation.py:90 passes None — reference quirk kept)."""
    from ocpg_tpu.evaluation.davis_eval import evaluate_davis, global_summary

    T, H, W = 6, 40, 48
    gt = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        gt[t, 8:28, 8 + t:28 + t] = 1
    _write_davis_tree(tmp_path, {"seq_a": gt})

    # Results perfect on interior frames, garbage on first/last: edge frames
    # must not affect the score.
    res = gt.copy()
    res[0] = 0
    res[-1, :, :] = 0
    res[-1, 0:5, 0:5] = 1
    res_dir = tmp_path / "results"
    _write_davis_tree(res_dir.parent, {"seq_a": res}, task_dirs=("results",))

    m = evaluate_davis(str(tmp_path), str(res_dir), "val", task="semi-supervised")
    s = global_summary(m)
    assert s["J&F-Mean"] == pytest.approx(1.0)
    assert len(m["J"]["M_per_object"]) == 1

    # Unsupervised on the same tree scores all frames, so the garbage edge
    # frames must now hurt.
    m_u = evaluate_davis(str(tmp_path), str(res_dir), "val", task="unsupervised")
    assert global_summary(m_u)["J&F-Mean"] < 1.0


def test_evaluate_davis_unsupervised_honors_void(tmp_path):
    """Void label 255 in GT must be excluded from J and F in the
    unsupervised protocol (davis.py:87-90 + evaluation.py:88)."""
    from ocpg_tpu.evaluation.davis_eval import evaluate_davis, global_summary

    T, H, W = 3, 40, 48
    gt = np.zeros((T, H, W), np.uint8)
    gt[:, 8:28, 8:28] = 1
    gt[:, 8:28, 24:32] = 255          # void strip overlapping the object edge
    _write_davis_tree(tmp_path, {"seq_v": gt})

    # Prediction fills the void strip as object: wrong only on void pixels.
    res = np.zeros((T, H, W), np.uint8)
    res[:, 8:28, 8:32] = 1
    res_dir = tmp_path / "results"
    _write_davis_tree(res_dir.parent, {"seq_v": res}, task_dirs=("results",))

    m = evaluate_davis(str(tmp_path), str(res_dir), "val", task="unsupervised")
    s = global_summary(m)
    assert s["J-Mean"] == pytest.approx(1.0)      # disagreement is all void
    assert s["F-Mean"] == pytest.approx(1.0)


def test_db_statistics_decay_and_docstring_semantics():
    """db_statistics computes stats over exactly the frames given (no edge
    dropping here) and keeps int64 bin indices for >255-frame sequences."""
    from ocpg_tpu.evaluation.davis_eval import db_statistics

    vals = np.linspace(1.0, 0.0, 20)
    M, R, D = db_statistics(vals)
    assert M == pytest.approx(vals.mean())
    assert R == pytest.approx((vals > 0.5).mean())
    ids = (np.round(np.linspace(1, 20, 5) + 1e-10) - 1).astype(int)
    want_d = vals[ids[0]:ids[1] + 1].mean() - vals[ids[3]:ids[4] + 1].mean()
    assert D == pytest.approx(want_d)

    # 300-frame sequence: the reference's uint8 cast (utils.py:151) would
    # wrap index 300 -> 44 and corrupt decay; int64 keeps it sane.
    long_vals = np.linspace(1.0, 0.0, 300)
    _, _, D_long = db_statistics(long_vals)
    assert D_long == pytest.approx(long_vals[:76].mean() - long_vals[224:].mean(), abs=0.02)
    assert 0.7 < D_long < 0.8


def test_shift_zero_is_perfect_and_shifts_hurt_monotonically():
    H, W = 100, 100
    base = rect(H, W, 10, 40, 10, 50)
    f0 = f_measure(base, base)
    assert f0 == 1.0
    # bound_pix = ceil(.008*norm([100,100])) = 2 -> a 3px shift breaks matches
    f3 = f_measure(rect(H, W, 10, 40, 7, 47), base)
    f1 = f_measure(rect(H, W, 10, 40, 9, 49), base)
    assert f1 > f3
