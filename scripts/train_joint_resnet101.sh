#!/bin/bash
# Joint training: refcoco/+/g pseudo-video clips + Ref-YouTube-VOS
# (reference: datasets/concat_dataset.py:19-34, registry 'joint' entry)
python -m ocpg_tpu.cli.train \
  --dataset_file joint --backbone resnet101 --supervision full \
  --ytvos_path ${YTVOS_PATH:-/data/refer-youtube-vos} \
  --coco_path ${COCO_PATH:-/data/coco} \
  --refexp_ann_dir ${REFEXP_ANN_DIR:-/data/coco/refexp_anns} \
  --epochs 10 --num_frames 3 --batch_size ${OCPG_BS:-2} \
  --output_dir output/joint_r101 "$@"
