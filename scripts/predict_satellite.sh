#!/bin/sh
# Satellite (old Tagil) prediction (reference predict_satellite.sh: 384x576).
ckpt=${1:?usage: predict_satellite.sh <checkpoint-dir>}
python -m leastereo_tpu.cli.predict \
  --dataset satellite --listset satellite \
  --crop_height 384 --crop_width 576 --maxdisp 192 \
  --checkpoint "$ckpt" --output_dir predictions/satellite
