#!/bin/sh
#SBATCH --job-name=leastereo-tpu-train
#SBATCH --time=20:00:00
#SBATCH --mem=32G
# TPU-pod analog of reference cluster/sbatch_train.sh (3x K40m SLURM):
# one task per host; jax.distributed.initialize() inside the driver spans the
# pod slice, and the (data, disp) mesh covers all chips.
srun sh scripts/train_satellite.sh "${1:-satellite_cluster}"
