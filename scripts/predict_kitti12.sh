#!/bin/sh
# KITTI 2012 test-set prediction (reference predict_kitti12.sh: 384x1248).
ckpt=${1:?usage: predict_kitti12.sh <checkpoint-dir>}
python -m leastereo_tpu.cli.predict \
  --dataset kitti12 --listset kitti12 \
  --crop_height 384 --crop_width 1248 --maxdisp 192 \
  --checkpoint "$ckpt" --output_dir predictions/kitti12
