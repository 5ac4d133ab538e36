#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_train_a2d_resnet101_boxvos.sh (torchrun -> one SPMD program).
# NOTE: the reference passes --supervision_type to main.py but the flag does not
# exist in opts.py — this recipe dies in argparse upstream and the BoxInst
# pairwise machinery (segmentation.py:358-500) is dead code there.  Here the
# flag parses and boxinst/boxvos enable the pairwise color-similarity losses
# (ocpg_tpu/models/pairwise.py; see PARITY.md "BoxInst pairwise").
# Reference per-GPU batch preserved (ADVICE r4): step time is linear in
# batch (TRAIN_OPPOINTS.json), so OCPG_BS=1 is the equal-throughput
# lower-latency variant if you compensate with 2x chips or an lr rescale.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/a2d}
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone resnet101 --supervision box --supervision_type boxvos \
  --a2d_path "$DATA_ROOT" --batch_size ${OCPG_BS:-2} \
  --output_dir output/train_a2d_resnet101_boxvos --epochs 12 --lr_drop 3 5
