#!/bin/sh
# DFC2019 evaluation (reference eval_dfc2019.sh).
ckpt=${1:?usage: eval_dfc2019.sh <checkpoint-dir>}
python -m leastereo_tpu.cli.evaluate \
  --dataset dfc2019 --listset dfc2019 \
  --crop_height 1024 --crop_width 1024 --maxdisp 192 \
  --checkpoint "$ckpt" --output_dir eval/dfc2019 --round_disp
