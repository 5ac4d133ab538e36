#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_ytvos_resnet101.sh (torchrun -> one SPMD program).
set -ex
DATA_ROOT=${DATA_ROOT:-/data/ytvos}
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone resnet101 --supervision full \
  --ytvos_path "$DATA_ROOT" \
  --output_dir output/train_ytvos_resnet101_fullsup --epochs 10 --lr_drop 6 8
