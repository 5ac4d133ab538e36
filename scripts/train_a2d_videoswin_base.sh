#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_a2d_videoswinb.sh (torchrun -> one SPMD program).
# Operating point: the reference trains at --batch_size 2/GPU; measured on v5e
# the train step scales exactly linearly in batch (bs2 = 2.06x bs1 ms/step,
# TRAIN_OPPOINTS.json / PROFILE.md round-11), so bs=1/chip is the measured-best
# default — same throughput, half the latency and activation memory; scale by
# adding data-parallel chips.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone video_swin_b_p4w7 --supervision box \
  --a2d_path "$DATA_ROOT" \
  --output_dir output/train_a2d_videoswin_base --epochs 12 --lr_drop 3 5 --use_checkpoint
