#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_ytvos_videoswin.sh (torchrun -> one SPMD program).
# Reference per-GPU batch 2 preserved (dist_train_ytvos_videoswin.sh; ADVICE
# r4); OCPG_BS=1 is the equal-throughput lower-latency variant (step time is
# linear in batch, TRAIN_OPPOINTS.json).
set -ex
DATA_ROOT=${DATA_ROOT:-/data/ytvos}
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone video_swin_t_p4w7 --supervision box \
  --ytvos_path "$DATA_ROOT" --batch_size ${OCPG_BS:-2} \
  --output_dir output/train_ytvos_videoswin_tiny --epochs 10 --lr_drop 6 8
