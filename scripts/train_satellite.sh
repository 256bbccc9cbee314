#!/bin/sh
# Satellite fine-tune (reference train_satellite.sh: resume SceneFlow,
# 3-way data parallelism -> mesh data axis).
exp=${1:-satellite_ft}
resume=${2:-}
resume_flag=""
[ -n "$resume" ] && resume_flag="--resume $resume"
python -m leastereo_tpu.cli.train \
  --dataset satellite --listset satellite \
  --crop_height 192 --crop_width 384 --maxdisp 192 \
  --batch_size 6 --epochs 800 --solver adam --lr 0.001 \
  $resume_flag \
  --experiment "$exp" 2>&1 | tee "train_satellite_$exp.log"
