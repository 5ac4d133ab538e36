#!/bin/bash
# Ref-YouTube-VOS, ResNet-101, box supervision (reference: dist_train_ytvos_*)
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone resnet101 --supervision box \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --epochs 10 --num_frames 3 --batch_size 2 \
  --output_dir output/ytvos_r101_boxsup "$@"
