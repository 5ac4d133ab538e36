#!/usr/bin/env bash
# RefCOCO/+/g pretraining with per-epoch val (reference main_pretrain.py).
set -ex
COCO=${COCO:-/data/coco}
python -m ocpg_tpu.cli.pretrain --dataset_file all --coco_path "$COCO" \
  --as_sequence --num_frames 3 --output_dir output/pretrain_all
