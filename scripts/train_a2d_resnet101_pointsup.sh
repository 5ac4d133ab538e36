#!/bin/bash
python -m ocpg_tpu.cli.train \
  --dataset_file a2d --backbone resnet101 --supervision point \
  --a2d_path ${A2D_PATH:-/data/a2d-sentences} \
  --epochs 12 --num_frames 3 --batch_size ${OCPG_BS:-2} \
  --output_dir output/a2d_r101_pointsup "$@"
