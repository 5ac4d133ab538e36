#!/bin/bash
# Offline pseudo-label generation (reference: pre_process/generate_anno_a2d.py)
python -m ocpg_tpu.preprocess.generate_anno --dataset a2d \
  --root ${A2D_PATH:-/data/a2d-sentences} \
  --densecl ${DENSECL_CKPT:-checkpoints/densecl_r101_imagenet_200ep.pth} "$@"
