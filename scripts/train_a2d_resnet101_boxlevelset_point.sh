#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_a2d_resnet101_boxlevelset_point.sh (torchrun -> one SPMD program).
# NOTE: the reference passes --supervision_type but the flag does not exist in
# opts.py (recipe dies in argparse upstream).  Here it parses; this value keeps
# the default loss suite (level-set is always on, as upstream).  PARITY.md
# "BoxInst pairwise" has the full ledger entry.
# Reference per-GPU batch preserved (ADVICE r4): step time is linear in
# batch (TRAIN_OPPOINTS.json), so OCPG_BS=1 is the equal-throughput
# lower-latency variant if you compensate with 2x chips or an lr rescale.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone resnet101 --supervision point --supervision_type boxlevelset \
  --a2d_path "$DATA_ROOT" --batch_size ${OCPG_BS:-2} \
  --output_dir output/train_a2d_resnet101_boxlevelset_point --epochs 12 --lr_drop 3 5
