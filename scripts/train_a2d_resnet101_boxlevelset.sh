#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_a2d_resnet101_boxlevelset.sh (torchrun -> one SPMD program).
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone resnet101 --supervision box \
  --a2d_path "$DATA_ROOT" \
  --output_dir output/train_a2d_resnet101_boxlevelset --epochs 12 --lr_drop 3 5
