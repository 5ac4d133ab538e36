#!/bin/bash
python -m ocpg_tpu.cli.infer_ytvos \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --checkpoint "$1" --output_dir output/ytvos_infer \
  --buckets exact
