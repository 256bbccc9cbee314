#!/bin/sh
# Model export (reference make_onnx.sh analog): StableHLO with round-trip check.
ckpt=${1:-}
ckpt_flag=""
[ -n "$ckpt" ] && ckpt_flag="--checkpoint $ckpt"
python -m leastereo_tpu.cli.export \
  --height 576 --width 960 --maxdisp 192 $ckpt_flag \
  --format stablehlo --out leastereo.stablehlo
