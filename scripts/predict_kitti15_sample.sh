#!/bin/sh
# Single-sample KITTI 2015 prediction (reference predict_kitti15_sample.sh:
# same config as predict_kitti15.sh but over the one-frame sample listset —
# build one with e.g. `head -1 <lists>/kitti15/test.list > <lists>/kitti15_sample/test.list`).
ckpt=${1:?usage: predict_kitti15_sample.sh <checkpoint-dir> [listset]}
python -m leastereo_tpu.cli.predict \
  --dataset kitti15 --listset "${2:-kitti15_sample}" \
  --crop_height 384 --crop_width 1248 --maxdisp 192 \
  --checkpoint "$ckpt" --output_dir predictions/kitti15_sample
