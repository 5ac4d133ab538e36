#!/bin/bash
python -m ocpg_tpu.cli.train \
  --dataset_file ytvos --backbone video_swin_b_p4w7 --supervision box \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --epochs 10 --num_frames 3 --batch_size 1 \
  --output_dir output/ytvos_vswin_b "$@"
