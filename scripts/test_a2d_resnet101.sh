#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_test_a2d_resnet101_boxsup.sh.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
CKPT=${CKPT:-output/checkpoints}
python -m ocpg_tpu.cli.evaluate \
  --dataset_file a2d --backbone resnet101 --a2d_path "$DATA_ROOT" --checkpoint "$CKPT"
