#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_test_a2d_videoswint.sh.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
CKPT=${CKPT:-output/checkpoints}
python -m ocpg_tpu.cli.evaluate \
  --dataset_file a2d --backbone video_swin_t_p4w7 --a2d_path "$DATA_ROOT" --checkpoint "$CKPT"
