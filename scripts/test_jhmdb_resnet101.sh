#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_test_jhmdb_resnet101_boxsup.sh.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/jhmdb}
CKPT=${CKPT:-output/checkpoints}
python -m ocpg_tpu.cli.evaluate \
  --dataset_file jhmdb --backbone resnet101 --jhmdb_path "$DATA_ROOT" --checkpoint "$CKPT"
