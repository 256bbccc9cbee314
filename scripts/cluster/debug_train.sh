#!/bin/sh
# Interactive debug launch (reference cluster/debug_train.sh: srun the
# satellite recipe on a debug queue). Truncated satellite train config —
# one short epoch — for scheduler/dataset smoke-testing.
python -m leastereo_tpu.cli.train \
  --dataset satellite --listset satellite \
  --crop_height 192 --crop_width 384 --maxdisp 192 \
  --batch_size 2 --epochs 1 --max_steps_per_epoch 4 \
  --experiment debug "$@"
