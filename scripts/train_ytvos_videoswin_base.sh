#!/bin/bash
# Operating point: --batch_size 2/chip matches the reference recipe's per-GPU
# batch, so global batch (and the published convergence/accuracy behavior) is
# preserved on an equal chip count (ADVICE r4).  Per-chip throughput is the
# same at bs=1 (step time is exactly linear in batch, TRAIN_OPPOINTS.json /
# PROFILE.md round-11) — OCPG_BS=1 selects that lower-latency/-memory variant
# when you compensate with 2x data-parallel chips or an lr rescale.
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone video_swin_b_p4w7 --supervision box \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --epochs 10 --num_frames 3 --batch_size ${OCPG_BS:-2} \
  --output_dir output/ytvos_vswin_b "$@"
