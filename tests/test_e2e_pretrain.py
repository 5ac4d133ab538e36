"""End-to-end RefCOCO pretraining CLI (reference: main_pretrain.py —
T=1 image clips, per-epoch referring-detection val with bbox P@k + segm
metrics, engine.py:197-300).

Drives cli.pretrain over a synthetic COCO-format refexp dataset with a tiny
random-weight model on the 8-device CPU mesh: dataset build from the
instances_refcoco_{train,val}.json contract (the refexp_to_coco tool's
output schema), the jitted SPMD train step, orbax checkpointing, and the
in-loop evaluate_refexp_loop producing per-dataset metric records.
"""
import json
import sys

import numpy as np
import pytest
from PIL import Image

TINY_CFG = {
    "enc_layers": 1, "dec_layers": 2, "dim_feedforward": 64,
    "num_queries": 5, "compute_dtype": "float32",
    "text_layers": 2, "text_hidden": 128, "text_heads": 4, "text_ffn": 256,
    "text_vocab": 2048,
}

H, W = 64, 80


def _coco_json(image_names, captions):
    images, annotations = [], []
    for i, (name, cap) in enumerate(zip(image_names, captions)):
        images.append({"id": i, "file_name": name, "height": H, "width": W,
                       "caption": cap})
        annotations.append({
            "id": i, "image_id": i, "category_id": 1,
            "bbox": [20, 16, 32, 24],  # xywh
            "segmentation": [[20, 16, 52, 16, 52, 40, 20, 40]],
            "area": 32 * 24, "iscrowd": 0,
        })
    return {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "object"}]}


@pytest.fixture(scope="module")
def refcoco_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("refcoco_e2e")
    img_dir = root / "train2014"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    train_names = [f"img_{i}.jpg" for i in range(8)]
    val_names = [f"val_{i}.jpg" for i in range(2)]
    for name in train_names + val_names:
        arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / name)
    caps = ["the red square thing"] * 8
    with open(root / "instances_refcoco_train.json", "w") as f:
        json.dump(_coco_json(train_names, caps), f)
    with open(root / "instances_refcoco_val.json", "w") as f:
        json.dump(_coco_json(val_names, caps[:2]), f)
    return root


@pytest.mark.slow
def test_pretrain_cli(refcoco_tree, tmp_path, monkeypatch):
    from ocpg_tpu.cli import pretrain as cli

    out_dir = tmp_path / "pretrain_run"
    monkeypatch.setattr(sys, "argv", [
        "pretrain", "--dataset_file", "refcoco",
        "--coco_path", str(refcoco_tree),
        "--refexp_ann_dir", str(refcoco_tree),
        "--backbone", "resnet50", "--batch_size", "1", "--epochs", "1",
        "--eval_batch_size", "1",
        "--output_dir", str(out_dir),
        "--canvas", str(H), str(W),
        "--config_overrides", json.dumps(TINY_CFG),
    ])
    cli.main()

    with open(out_dir / "log.txt") as f:
        records = [json.loads(l) for l in f if l.strip()]
    assert len(records) == 1 and records[0]["epoch"] == 0
    assert np.isfinite(records[0]["loss"]) and records[0]["loss"] > 0

    # per-epoch refcoco val metrics recorded (main_pretrain.py:138-170):
    # bbox P@k from RefExpEvaluator + segm P@K/IoU/mAP from the COCO-style
    # evaluator, all finite probabilities
    for key in ("refcoco_bbox_P@1", "refcoco_bbox_P@5",
                "refcoco_segm_mAP 0.5:0.95", "refcoco_segm_overall_iou"):
        assert key in records[0], sorted(records[0])
        assert 0.0 <= records[0][key] <= 1.0

    ckpt_dir = out_dir / "checkpoints"
    assert ckpt_dir.is_dir() and any(ckpt_dir.iterdir())
