#!/bin/bash
# A2D-Sentences, ResNet-101, box supervision (reference: dist_train_a2d_resnet101_boxsup.sh)
# Operating point: --batch_size 2/chip matches the reference recipe's per-GPU
# batch, so global batch (and the published convergence/accuracy behavior) is
# preserved on an equal chip count (ADVICE r4).  Per-chip throughput is the
# same at bs=1 (step time is exactly linear in batch, TRAIN_OPPOINTS.json /
# PROFILE.md round-11) — OCPG_BS=1 selects that lower-latency/-memory variant
# when you compensate with 2x data-parallel chips or an lr rescale.
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone resnet101 --supervision box \
  --a2d_path ${A2D_PATH:-/data/a2d-sentences} \
  --epochs 12 --num_frames 3 --batch_size ${OCPG_BS:-2} \
  --output_dir output/a2d_r101_boxsup "$@"
