#!/bin/sh
# Middlebury full-size prediction (reference predict_md.sh: 1008x1512,
# maxdisp 408). --mesh_disp N shards the cost volume's disparity axis over N
# devices (the CP analog, SURVEY.md §2.4) so the 5-D volume fits; XLA inserts
# the 3D-conv halo exchanges. On 1 chip drop --mesh_disp or use half res.
ckpt=${1:?usage: predict_md.sh <checkpoint-dir> [mesh_disp]}
mesh_disp=${2:-2}
python -m leastereo_tpu.cli.predict \
  --dataset middlebury --listset middlebury \
  --crop_height 1008 --crop_width 1512 --maxdisp 408 \
  --mesh_disp "$mesh_disp" \
  --checkpoint "$ckpt" --output_dir predictions/middlebury
