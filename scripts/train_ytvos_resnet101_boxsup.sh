#!/bin/bash
# Ref-YouTube-VOS, ResNet-101, box supervision (reference: dist_train_ytvos_*)
# Operating point: the reference counterpart (dist_train_ytvos_resnet101_
# boxsup.sh) passes NO --batch_size, inheriting opts.py:12 default 1 — so
# bs=1/chip IS the reference-parity operating point here.  OCPG_BS overrides.
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone resnet101 --supervision box \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --epochs 10 --num_frames 3 --batch_size ${OCPG_BS:-1} \
  --output_dir output/ytvos_r101_boxsup "$@"
