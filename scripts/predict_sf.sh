#!/bin/sh
# SceneFlow prediction (reference predict_sf.sh: 576x960).
ckpt=${1:?usage: predict_sf.sh <checkpoint-dir>}
python -m leastereo_tpu.cli.predict \
  --dataset sceneflow --listset sceneflow_test \
  --crop_height 576 --crop_width 960 --maxdisp 192 \
  --checkpoint "$ckpt" --output_dir predictions/sceneflow
