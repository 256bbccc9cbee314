#!/bin/sh
# Zero-download end-to-end smoke: search -> decode -> train -> predict ->
# evaluate on the bundled dataset/sceneflow_part pairs (CPU, tiny config).
# The analog of the reference's demo-list operational test (SURVEY.md §4.1:
# search.sh on sceneflow_demo IS its integration test) — but covering every
# driver in sequence. Exits nonzero on the first failing stage.
set -e
run=${1:-smoke}
root=run/smoke_e2e_$run
rm -rf "$root" predictions/smoke_e2e

echo "=== [0/5] native host-IO library (optional: needs g++ + libpng)"
sh scripts/build_native.sh || echo "native build unavailable; loaders fall back to PIL"

common="--platform cpu --dataset sceneflow_part --listset sceneflow_part \
  --maxdisp 48 --crop_height 96 --crop_width 192 --workers 0"
tiny="--fea_num_layers 3 --fea_filter_multiplier 2 --fea_block_multiplier 2 --fea_step 2 \
  --mat_num_layers 4 --mat_filter_multiplier 2 --mat_block_multiplier 2 --mat_step 2"

echo "=== [1/5] search"
python -m leastereo_tpu.cli.search $common $tiny \
  --batch_size 1 --epochs 2 --alpha_epoch 1 --max_steps_per_epoch 2 \
  --run_root "$root" --experiment s

echo "=== [2/5] decode"
python -m leastereo_tpu.cli.decode \
  --checkpoint "$root/sceneflow_part-search/s/checkpoints/best" \
  --fea_step 2 --mat_step 2

echo "=== [3/5] train (decoded arch)"
arch=$root/sceneflow_part-search/s/checkpoints/best/architecture
python -m leastereo_tpu.cli.train $common $tiny \
  --net_arch_fea "$arch/feature_network_path.npy" \
  --cell_arch_fea "$arch/feature_genotype.npy" \
  --net_arch_mat "$arch/matching_network_path.npy" \
  --cell_arch_mat "$arch/matching_genotype.npy" \
  --batch_size 1 --epochs 1 --max_steps_per_epoch 2 \
  --run_root "$root" --experiment t

echo "=== [4/5] predict"
python -m leastereo_tpu.cli.predict $common $tiny \
  --net_arch_fea "$arch/feature_network_path.npy" \
  --cell_arch_fea "$arch/feature_genotype.npy" \
  --net_arch_mat "$arch/matching_network_path.npy" \
  --cell_arch_mat "$arch/matching_genotype.npy" \
  --checkpoint "$root/sceneflow_part-train/t/checkpoints/best" \
  --output_dir predictions/smoke_e2e --split test

echo "=== [5/5] evaluate"
python -m leastereo_tpu.cli.evaluate $common $tiny \
  --net_arch_fea "$arch/feature_network_path.npy" \
  --cell_arch_fea "$arch/feature_genotype.npy" \
  --net_arch_mat "$arch/matching_network_path.npy" \
  --cell_arch_mat "$arch/matching_genotype.npy" \
  --checkpoint "$root/sceneflow_part-train/t/checkpoints/best" \
  --output_dir predictions/smoke_e2e --split test

echo "smoke_e2e: ALL STAGES PASSED"
