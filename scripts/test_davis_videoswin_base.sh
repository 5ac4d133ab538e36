#!/usr/bin/env bash
# Counterpart of /root/reference/scripts/dist_test_davis_videoswinb.sh:
# mesh-sharded inference then offline J&F scoring.
set -ex
DATA_ROOT=${DATA_ROOT:-/data/ref-davis}
CKPT=${CKPT:-output/checkpoints}
python -m ocpg_tpu.cli.infer_davis --davis_path "$DATA_ROOT" --checkpoint "$CKPT" \
  --backbone video_swin_b_p4w7 --output_dir output/davis_swinb --buckets exact
python -m ocpg_tpu.cli.eval_davis --davis_path "$DATA_ROOT" \
  --results_path output/davis_swinb/valid
