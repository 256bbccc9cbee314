#!/bin/sh
# DFC2019 fine-tune (reference train_dfc2019.sh: crop 384x576, batch 3 over
# 3 GPUs -> mesh data axis here, resume SceneFlow best).
exp=${1:-dfc2019_ft}
resume=${2:-}
resume_flag=""
[ -n "$resume" ] && resume_flag="--resume $resume"
python -m leastereo_tpu.cli.train \
  --dataset dfc2019 --listset dfc2019 \
  --crop_height 384 --crop_width 576 --maxdisp 192 \
  --batch_size 3 --epochs 800 --solver adam --lr 0.001 \
  $resume_flag \
  --experiment "$exp" 2>&1 | tee "train_dfc2019_$exp.log"
