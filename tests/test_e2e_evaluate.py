"""End-to-end A2D evaluation CLI (reference: main.py --eval ->
engine.py:126-194 — forward, postprocess to RLE at native resolution,
COCOeval-style segm metrics + P@K/IoU).

Drives cli.evaluate over a synthetic A2D val split with a tiny random-weight
model: videoset.csv split filtering, mp4 decode, the mesh-sharded eval loop
with padded tail batches, and the printed metrics JSON.
"""
import io
import json
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
cv2 = pytest.importorskip("cv2")

TINY_CFG = {
    "enc_layers": 1, "dec_layers": 2, "dim_feedforward": 64,
    "num_queries": 5, "compute_dtype": "float32",
    "text_layers": 2, "text_hidden": 128, "text_heads": 4, "text_ffn": 256,
    "text_vocab": 2048,
}

H, W, N_FRAMES = 64, 80, 8


@pytest.fixture(scope="module")
def a2d_val_root(tmp_path_factory):
    """Synthetic A2D-Sentences layout with two VAL-split videos (videoset.csv
    last column 1 — reference datasets/a2d.py split filter)."""
    root = tmp_path_factory.mktemp("a2d_val")
    rng = np.random.default_rng(7)
    (root / "Release" / "clips320H").mkdir(parents=True)
    videos = ["vidV0", "vidV1"]
    (root / "text_annotations").mkdir(exist_ok=True)
    ann_lines = ["video_id,instance_id,query"]
    set_lines = []
    for vid in videos:
        (root / "text_annotations" / "a2d_annotation_with_instances" / vid
         ).mkdir(parents=True)
        writer = cv2.VideoWriter(
            str(root / "Release" / "clips320H" / f"{vid}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, H))
        for _ in range(N_FRAMES):
            writer.write((rng.random((H, W, 3)) * 255).astype(np.uint8))
        writer.release()

        mask = np.zeros((H, W), np.uint8)
        mask[20:40, 30:60] = 1
        heat = np.zeros((1, H, W), np.float32)
        heat[0, 18:42, 28:62] = 0.8
        with h5py.File(root / "text_annotations"
                       / "a2d_annotation_with_instances" / vid / "00004.h5",
                       "w") as f:
            f.create_dataset("instance", data=np.asarray([2]))
            f.create_dataset("reMask", data=mask.T)
            f.create_dataset("heatBBox", data=heat)
            f.create_dataset("heatPoint", data=heat)
        ann_lines.append(f"{vid},2,a person running left")
        set_lines.append(f"{vid},x,x,x,x,x,x,x,1")  # 1 = val/test split

    with open(root / "text_annotations" / "a2d_annotation.txt", "w") as f:
        f.write("\n".join(ann_lines) + "\n")
    with open(root / "Release" / "videoset.csv", "w") as f:
        f.write("\n".join(set_lines) + "\n")
    return root


def test_evaluate_cli(a2d_val_root, monkeypatch):
    """Fast-suite CLI smoke (VERDICT r4 next-step 4): ~100 s cold-cache on
    the 1-core reference host (one tiny eval-forward compile over the
    8-device mesh).  Over the 60 s slow-mark guideline, kept in the default
    suite deliberately: driving every CLI by default is the point."""
    from ocpg_tpu.cli import evaluate as cli

    monkeypatch.setattr(sys, "argv", [
        "evaluate", "--dataset_file", "a2d",
        "--a2d_path", str(a2d_val_root),
        "--backbone", "resnet50", "--batch_size", "1", "--num_frames", "3",
        "--canvas", str(H), str(W),
        "--config_overrides", json.dumps(TINY_CFG),
    ])
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli.main()
    metrics = json.loads(buf.getvalue())

    # the full reference metric surface (engine.py:183-189, a2d_eval.py:37-96)
    for key in ("mAP 0.5:0.95", "AP50", "AP75", "overall_iou", "mean_iou",
                "P@0.5", "P@0.9"):
        assert key in metrics, key
        assert np.isfinite(metrics[key])
    # random weights: no accuracy assertion, but the probabilities are bounded
    assert 0.0 <= metrics["mAP 0.5:0.95"] <= 1.0
    assert 0.0 <= metrics["overall_iou"] <= 1.0
