#!/bin/bash
python -m ocpg_tpu.preprocess.generate_anno --dataset ytvos \
  --root ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --densecl ${DENSECL_CKPT:-checkpoints/densecl_r101_imagenet_200ep.pth} "$@"
