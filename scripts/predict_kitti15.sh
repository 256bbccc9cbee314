#!/bin/sh
# KITTI 2015 test-set prediction (reference predict_kitti15.sh: 384x1248,
# maxdisp 192, shipped-best architecture).
ckpt=${1:?usage: predict_kitti15.sh <checkpoint-dir>}
python -m leastereo_tpu.cli.predict \
  --dataset kitti15 --listset kitti15 \
  --crop_height 384 --crop_width 1248 --maxdisp 192 \
  --checkpoint "$ckpt" --output_dir predictions/kitti15
