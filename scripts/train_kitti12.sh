#!/bin/sh
# KITTI 2012 fine-tune (reference train_kitti12.sh: crop 288x576, 800 epochs,
# resume from the SceneFlow-best checkpoint).
exp=${1:-kitti12_ft}
resume=${2:?usage: train_kitti12.sh <exp> <sceneflow-checkpoint-dir>}
python -m leastereo_tpu.cli.train \
  --dataset kitti12 --listset kitti12 \
  --crop_height 288 --crop_width 576 --maxdisp 192 \
  --batch_size 4 --epochs 800 --solver adam --lr 0.001 \
  --resume "$resume" \
  --experiment "$exp" 2>&1 | tee "train_kitti12_$exp.log"
