#!/bin/bash
# Ref-DAVIS inference + J&F scoring (reference: dist_test_davis_*.sh + eval_davis.py)
python -m ocpg_tpu.cli.infer_davis \
  --davis_path ${DAVIS_PATH:-/data/ref-davis} \
  --checkpoint "$1" --output_dir output/davis_infer \
  --buckets exact
for anno in 0 1 2 3; do
  python -m ocpg_tpu.cli.eval_davis \
    --davis_path ${DAVIS_PATH:-/data/ref-davis}/valid \
    --results_path output/davis_infer/valid/anno_${anno}
done
