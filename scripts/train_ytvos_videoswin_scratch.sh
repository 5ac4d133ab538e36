#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_scratch_ytvos_videoswin.sh (torchrun -> one SPMD program).
set -ex
DATA_ROOT=${DATA_ROOT:-/data/ytvos}
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone video_swin_t_p4w7 --supervision box \
  --ytvos_path "$DATA_ROOT" \
  --output_dir output/train_ytvos_videoswin_scratch --epochs 10 --lr_drop 6 8
