#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_test_ytvos_videoswinb.sh:
# per-expression mask PNGs for server-side scoring.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/ref-youtube-vos}
CKPT=${CKPT:-output/checkpoints}
python -m ocpg_tpu.cli.infer_ytvos --ytvos_path "$DATA_ROOT" --checkpoint "$CKPT" \
  --backbone video_swin_b_p4w7 --output_dir output/ytvos_swinb --buckets exact
