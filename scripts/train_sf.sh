#!/bin/sh
# SceneFlow retrain (reference train_sf.sh: crop 384x576, bs 4, 20 epochs).
exp=${1:-sf_retrain}
python -m leastereo_tpu.cli.train \
  --dataset sceneflow --listset sceneflow_train \
  --crop_height 384 --crop_width 576 --maxdisp 192 \
  --batch_size 4 --epochs 20 --solver adam --lr 0.001 \
  --milestones 30 50 300 \
  --experiment "$exp" 2>&1 | tee "train_sf_$exp.log"
