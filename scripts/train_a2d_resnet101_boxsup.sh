#!/bin/bash
# A2D-Sentences, ResNet-101, box supervision (reference: dist_train_a2d_resnet101_boxsup.sh)
# Operating point: the reference trains at --batch_size 2/GPU; measured on v5e
# the train step scales exactly linearly in batch (bs2 = 2.06x bs1 ms/step,
# TRAIN_OPPOINTS.json / PROFILE.md round-11), so bs=1/chip is the measured-best
# default — same throughput, half the latency and activation memory; scale by
# adding data-parallel chips.
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone resnet101 --supervision box \
  --a2d_path ${A2D_PATH:-/data/a2d-sentences} \
  --epochs 12 --num_frames 3 --batch_size 1 \
  --output_dir output/a2d_r101_boxsup "$@"
