#!/bin/sh
# Decode a search checkpoint into genotype .npy artifacts (reference decode.sh).
ckpt=${1:?usage: decode.sh <search-checkpoint-dir>}
python -m leastereo_tpu.cli.decode --checkpoint "$ckpt"
