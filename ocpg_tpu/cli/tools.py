"""Data conversion tools.

Reference: /root/reference/tools/data/ —
  * convert_refexp_to_coco.py: REFER pickles (refs(unc).p + instances.json)
    -> COCO-format referring-detection JSONs, one annotation per (ref, sent),
    image caption = sentence.
  * convert_davis_to_ytvos.py: Ref-DAVIS17 release -> YTVOS-style layout
    (JPEGImages/, Annotations/, meta_expressions.json) so the davis dataset
    reader can use the ytvos code path.

Usage:
    python -m ocpg_tpu.cli.tools refexp2coco --refer_root /data/refer --dataset refcoco --output out/
    python -m ocpg_tpu.cli.tools davis2ytvos --davis_root /data/ref-davis --output /data/ref-davis-ytvos
"""

from __future__ import annotations

import argparse
import json
import pickle
import shutil
from pathlib import Path


def refexp_to_coco(refer_root: str, dataset: str, split_by: str, output: str):
    from ..data.refer import REFER

    refer = REFER(refer_root, dataset, split_by)

    out_dir = Path(output)
    out_dir.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "testA", "testB", "test"):
        split_refs = refer.loadRefs(refer.getRefIds(split=split))
        if not split_refs:
            continue
        images, annotations = [], []
        next_img_id = 0
        for r in split_refs:
            ann = refer.refToAnn[r["ref_id"]]
            im = refer.Imgs[r["image_id"]]
            for sent in r["sentences"]:
                images.append({
                    "id": next_img_id,
                    "file_name": im["file_name"],
                    "height": im["height"], "width": im["width"],
                    "caption": sent["sent"],
                    "original_id": im["id"],
                })
                annotations.append({
                    "id": len(annotations),
                    "image_id": next_img_id,
                    "bbox": ann["bbox"],
                    "segmentation": ann.get("segmentation", []),
                    "area": ann.get("area", ann["bbox"][2] * ann["bbox"][3]),
                    "iscrowd": ann.get("iscrowd", 0),
                    "category_id": ann["category_id"],
                })
                next_img_id += 1
        out = {"images": images, "annotations": annotations,
               "categories": refer.data["categories"]}
        path = out_dir / f"instances_{dataset}_{split}.json"
        with open(path, "w") as f:
            json.dump(out, f)
        print(f"wrote {path} ({len(images)} image-sentence pairs)")


def davis_to_ytvos(davis_root: str, output: str):
    root = Path(davis_root)
    out = Path(output)
    for split in ("train", "valid"):
        set_name = {"train": "train", "valid": "val"}[split]
        split_file = root / "ImageSets" / "2017" / f"{set_name}.txt"
        if not split_file.exists():
            continue
        videos = [l.strip() for l in open(split_file) if l.strip()]
        (out / split).mkdir(parents=True, exist_ok=True)
        for sub in ("JPEGImages", "Annotations"):
            src_base = root / sub / "480p" if (root / sub / "480p").exists() else root / sub
            for v in videos:
                dst = out / split / sub / v
                if not dst.exists() and (src_base / v).exists():
                    dst.parent.mkdir(parents=True, exist_ok=True)
                    shutil.copytree(src_base / v, dst)
        # merge the 4 annotators' expression files into one meta_expressions.json
        meta = {"videos": {}}
        davis_meta = root / "meta_expressions" / split / "meta_expressions.json"
        if davis_meta.exists():
            with open(davis_meta) as f:
                meta = json.load(f)
        out_meta = out / "meta_expressions" / split
        out_meta.mkdir(parents=True, exist_ok=True)
        with open(out_meta / "meta_expressions.json", "w") as f:
            json.dump(meta, f)
        print(f"{split}: {len(videos)} videos")


def convert_checkpoint(source: str, output: str, backbone: str = "resnet101",
                       enc_layers: int = 4, dec_layers: int = 4,
                       num_feature_levels: int = 4, text_layers: int = 12):
    """One-time reference .pth -> orbax conversion (tools/load_pretrained_weights.py
    analogue, plus the full-framework weight conversion).  The output
    directory is consumable by every `--checkpoint` flag (engine
    checkpoint.load_params)."""
    from ..engine.checkpoint import CheckpointManager
    from ..utils.torch_weights import convert_ocpg, load_torch_file

    sd = load_torch_file(source)
    params, frozen = convert_ocpg(
        sd, enc_layers=enc_layers, dec_layers=dec_layers,
        num_feature_levels=num_feature_levels, backbone=backbone,
        text_layers=text_layers)
    CheckpointManager(output, max_to_keep=1).save(
        0, {"params": {"params": params, "frozen": frozen}})
    print(f"converted {source} -> {output}")


def main():
    p = argparse.ArgumentParser("ocpg_tpu data tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("refexp2coco")
    p1.add_argument("--refer_root", required=True)
    p1.add_argument("--dataset", default="refcoco", choices=["refcoco", "refcoco+", "refcocog"])
    p1.add_argument("--split_by", default="unc")
    p1.add_argument("--output", required=True)
    p2 = sub.add_parser("davis2ytvos")
    p2.add_argument("--davis_root", required=True)
    p2.add_argument("--output", required=True)
    p3 = sub.add_parser("convert_checkpoint")
    p3.add_argument("--source", required=True, help="reference OCPG .pth")
    p3.add_argument("--output", required=True, help="orbax checkpoint dir")
    p3.add_argument("--backbone", default="resnet101")
    p3.add_argument("--enc_layers", type=int, default=4)
    p3.add_argument("--dec_layers", type=int, default=4)
    p3.add_argument("--num_feature_levels", type=int, default=4)
    p3.add_argument("--text_layers", type=int, default=12)
    args = p.parse_args()
    if args.cmd == "refexp2coco":
        refexp_to_coco(args.refer_root, args.dataset, args.split_by, args.output)
    elif args.cmd == "convert_checkpoint":
        convert_checkpoint(args.source, args.output, args.backbone,
                           args.enc_layers, args.dec_layers,
                           args.num_feature_levels, args.text_layers)
    else:
        davis_to_ytvos(args.davis_root, args.output)


if __name__ == "__main__":
    main()
