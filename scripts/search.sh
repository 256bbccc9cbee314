#!/bin/sh
# NAS search, reduced config (reference search.sh: filter 4 / block 3,
# crop 192x384, 10 epochs SceneFlow, arch updates from epoch 3).
exp=${1:-search0}
python -m leastereo_tpu.cli.search \
  --dataset sceneflow_part --listset sceneflow_part \
  --crop_height 192 --crop_width 384 --maxdisp 192 \
  --fea_filter_multiplier 4 --fea_block_multiplier 3 --fea_step 3 \
  --mat_filter_multiplier 4 --mat_block_multiplier 3 --mat_step 3 \
  --batch_size 4 --epochs 10 --alpha_epoch 3 \
  --lr 0.025 --min_lr 0.001 --arch_lr 0.001 \
  --experiment "$exp" 2>&1 | tee "search_$exp.log"
