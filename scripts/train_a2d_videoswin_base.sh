#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_a2d_videoswinb.sh (torchrun -> one SPMD program).
# Operating point: --batch_size 2/chip matches the reference recipe's per-GPU
# batch (dist_train_a2d_videoswinb.sh:27), preserving global batch on an equal
# chip count (ADVICE r4).  Step time is linear in batch (TRAIN_OPPOINTS.json),
# so OCPG_BS=1 is the equal-throughput lower-latency/-memory variant when you
# compensate with 2x data-parallel chips or an lr rescale.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone video_swin_b_p4w7 --supervision box \
  --a2d_path "$DATA_ROOT" --batch_size ${OCPG_BS:-2} \
  --output_dir output/train_a2d_videoswin_base --epochs 12 --lr_drop 3 5 --use_checkpoint
