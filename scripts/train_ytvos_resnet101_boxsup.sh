#!/bin/bash
# Ref-YouTube-VOS, ResNet-101, box supervision (reference: dist_train_ytvos_*)
# Operating point: the reference trains at --batch_size 2/GPU; measured on v5e
# the train step scales exactly linearly in batch (bs2 = 2.06x bs1 ms/step,
# TRAIN_OPPOINTS.json / PROFILE.md round-11), so bs=1/chip is the measured-best
# default — same throughput, half the latency and activation memory; scale by
# adding data-parallel chips.
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone resnet101 --supervision box \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --epochs 10 --num_frames 3 --batch_size 1 \
  --output_dir output/ytvos_r101_boxsup "$@"
