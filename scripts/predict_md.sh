#!/bin/sh
# Middlebury full-size prediction (reference predict_md.sh: 1008x1512,
# maxdisp 408). Uses the disparity mesh axis (CP analog) so the 5-D volume
# fits: run on >=2 chips with --mesh_disp 2, or 1 chip at half resolution.
ckpt=${1:?usage: predict_md.sh <checkpoint-dir>}
python -m leastereo_tpu.cli.predict \
  --dataset middlebury --listset middlebury \
  --crop_height 1008 --crop_width 1512 --maxdisp 408 \
  --checkpoint "$ckpt" --output_dir predictions/middlebury
