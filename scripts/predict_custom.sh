#!/bin/sh
# Zero-download prediction on the bundled dataset/sceneflow_part pairs
# (reference predict_custom.sh). Checkpoint optional: random init still
# exercises the full path.
ckpt=${1:-}
ckpt_flag=""
[ -n "$ckpt" ] && ckpt_flag="--checkpoint $ckpt"
python -m leastereo_tpu.cli.predict \
  --dataset sceneflow_part --listset sceneflow_part \
  --crop_height 576 --crop_width 960 --maxdisp 192 \
  $ckpt_flag --output_dir predictions/sceneflow_part
