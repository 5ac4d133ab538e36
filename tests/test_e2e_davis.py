"""End-to-end Ref-DAVIS pipeline: cli.infer_davis -> cli.eval_davis.

Exercises the full CLI glue the unit tests don't: meta_expressions parsing,
per-(annotator, object, chunk) request building, chunk merge, 0.1/0.3 argmax
merge, palette PNG writing under GT frame names, and the offline J&F scorer
with its CSV outputs (reference: /root/reference/inference_davis.py:164-271 +
/root/reference/eval_davis.py:24-60).

Runs a tiny random-weight model over a synthetic 2-video mini-DAVIS tree;
also validates the scorer itself by feeding GT masks as results (J&F == 1).
"""

import csv
import json
import sys

import numpy as np
import pytest
from PIL import Image

TINY_CFG = {
    "backbone": "resnet50", "enc_layers": 1, "dec_layers": 2,
    "dim_feedforward": 64, "num_queries": 5, "compute_dtype": "float32",
    "text_layers": 2, "text_hidden": 128, "text_heads": 4, "text_ffn": 256,
    "text_vocab": 2048,
}

VIDEOS = ["video_a", "video_b"]
FRAMES = ["00000", "00005", "00010", "00015"]
H, W = 48, 64


def _gt_masks(video: str) -> np.ndarray:
    """(T, H, W) uint8 palette index map with two moving box objects."""
    shift = 3 if video == "video_b" else 0
    out = np.zeros((len(FRAMES), H, W), np.uint8)
    for t in range(len(FRAMES)):
        x0 = 4 + 2 * t + shift
        out[t, 8:28, x0:x0 + 18] = 1          # object 1: left box
        out[t, 24:44, 40 - t:58 - t] = 2      # object 2: right box
    return out


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_davis")
    palette = [0, 0, 0, 236, 95, 103, 249, 145, 87] + [0] * (256 * 3 - 9)
    meta = {"videos": {}}
    for video in VIDEOS:
        gt = _gt_masks(video)
        (root / "valid" / "JPEGImages" / video).mkdir(parents=True)
        (root / "valid" / "Annotations" / video).mkdir(parents=True)
        (root / "Annotations" / video).mkdir(parents=True)
        for t, name in enumerate(FRAMES):
            rgb = np.full((H, W, 3), 40, np.uint8)
            rgb[gt[t] == 1] = (236, 95, 103)
            rgb[gt[t] == 2] = (87, 145, 249)
            Image.fromarray(rgb).save(root / "valid" / "JPEGImages" / video / f"{name}.jpg")
            pimg = Image.fromarray(gt[t], mode="P")
            pimg.putpalette(palette)
            pimg.save(root / "valid" / "Annotations" / video / f"{name}.png")
            pimg.save(root / "Annotations" / video / f"{name}.png")
        # 2 objects x 4 annotators; exp_list[obj_id * 4 + anno_id]
        meta["videos"][video] = {
            "frames": FRAMES,
            "expressions": {
                str(i): {"exp": f"the {'red left' if i < 4 else 'blue right'} "
                                f"box number {i}"}
                for i in range(8)
            },
        }
    (root / "meta_expressions" / "valid").mkdir(parents=True)
    with open(root / "meta_expressions" / "valid" / "meta_expressions.json", "w") as f:
        json.dump(meta, f)
    (root / "ImageSets" / "2017").mkdir(parents=True)
    with open(root / "ImageSets" / "2017" / "val.txt", "w") as f:
        f.write("\n".join(VIDEOS) + "\n")
    return root


def test_scorer_perfect_on_gt(davis_tree):
    """GT masks fed back as results must score J&F == 1 (scorer sanity)."""
    from ocpg_tpu.evaluation.davis_eval import evaluate_davis, global_summary

    metrics = evaluate_davis(str(davis_tree), str(davis_tree / "Annotations"), "val")
    s = global_summary(metrics)
    assert s["J&F-Mean"] == pytest.approx(1.0)
    assert s["J-Recall"] == pytest.approx(1.0)
    assert len(metrics["J"]["M_per_object"]) == 4     # 2 videos x 2 objects


def test_infer_then_eval_cli(davis_tree, tmp_path, monkeypatch):
    from ocpg_tpu.cli import eval_davis as eval_cli
    from ocpg_tpu.cli import infer_davis as infer_cli

    out_dir = tmp_path / "davis_out"
    monkeypatch.setattr(sys, "argv", [
        "infer_davis", "--davis_path", str(davis_tree),
        "--output_dir", str(out_dir),
        "--backbone", "resnet50", "--split", "valid",
        "--clip_len", "3",                      # 4 frames -> 2 chunks: merge path
        "--resize", "48", "--max_size", "64",
        "--config_overrides", json.dumps(TINY_CFG),
    ])
    infer_cli.main()

    # every (annotator, video, frame) palette PNG exists under the GT name
    total_fg = 0
    for anno_id in range(4):
        for video in VIDEOS:
            for name in FRAMES:
                p = out_dir / "valid" / f"anno_{anno_id}" / video / f"{name}.png"
                assert p.exists(), p
                img = Image.open(p)
                assert img.mode == "P" and img.size == (W, H)
                arr = np.asarray(img)
                assert arr.max() <= 2   # bg + 2 objects
                total_fg += int((arr > 0).sum())
    # non-finite logits merge to all-background; a finite random-weight model
    # assigns some pixels to objects (guards against silent-NaN regressions
    # like the tokenizer-vocab mismatch)
    assert total_fg > 0

    # score each annotator dir, as scripts/test_davis.sh does
    jf = []
    for anno_id in range(4):
        results = out_dir / "valid" / f"anno_{anno_id}"
        monkeypatch.setattr(sys, "argv", [
            "eval_davis", "--davis_path", str(davis_tree),
            "--results_path", str(results), "--set", "val",
        ])
        eval_cli.main()
        g_csv = results / "global_results-val.csv"
        seq_csv = results / "per-sequence_results-val.csv"
        assert g_csv.exists() and seq_csv.exists()
        with open(g_csv) as f:
            header, row = list(csv.reader(f))
        stats = dict(zip(header, map(float, row)))
        assert np.isfinite(stats["J&F-Mean"])
        assert 0.0 <= stats["J&F-Mean"] <= 1.0
        jf.append(stats["J&F-Mean"])
        with open(seq_csv) as f:
            rows = list(csv.reader(f))[1:]
        assert len(rows) == 4                       # 2 videos x 2 objects
    print("synthetic-DAVIS J&F per annotator:", jf)


def test_merge_annotator_masks_analytic():
    """Pin the reference 0.1-background / 0.3-floor argmax merge
    (inference_davis.py:255-262) on a hand-computed fixture."""
    from ocpg_tpu.cli.infer_davis import merge_annotator_masks

    # 2 objects, 1 frame, 2x3 pixels
    obj1 = np.array([[[0.9, 0.29, 0.31],
                      [0.05, 0.5, 0.2]]], np.float32)
    obj2 = np.array([[[0.8, 0.0, 0.31],
                      [0.0, 0.6, 0.3]]], np.float32)
    anno = np.stack([obj1, obj2])
    before = anno.copy()
    merged = merge_annotator_masks(anno)
    # (0,0): 0.9 vs 0.8 -> obj 1;  (0,1): all under the 0.3 floor -> bg;
    # (0,2): exact tie 0.31 -> first object (np.argmax first-occurrence);
    # (1,0): 0.05 floored -> bg;   (1,1): 0.6 wins -> obj 2;
    # (1,2): exactly 0.3 is KEPT (floor is strict <) and beats bg -> obj 2
    np.testing.assert_array_equal(
        merged, np.array([[[1, 0, 1], [0, 2, 2]]], np.uint8))
    assert merged.dtype == np.uint8
    np.testing.assert_array_equal(anno, before)  # input not mutated
