#!/bin/sh
# Middlebury half-res fine-tune (reference train_md.sh: maxdisp 408, shift 3).
exp=${1:-md_ft}
resume=${2:?usage: train_md.sh <exp> <sceneflow-checkpoint-dir>}
python -m leastereo_tpu.cli.train \
  --dataset middlebury --listset middlebury \
  --crop_height 384 --crop_width 576 --maxdisp 408 --shift 3 \
  --batch_size 2 --epochs 800 --solver adam --lr 0.001 \
  --resume "$resume" \
  --experiment "$exp" 2>&1 | tee "train_md_$exp.log"
