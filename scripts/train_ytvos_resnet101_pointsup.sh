#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_ytvos_resnet101_boxsup.sh (torchrun -> one SPMD program).
set -ex
DATA_ROOT=${DATA_ROOT:-/data/ytvos}
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone resnet101 --supervision point \
  --ytvos_path "$DATA_ROOT" \
  --output_dir output/train_ytvos_resnet101_pointsup --epochs 10 --lr_drop 6 8
