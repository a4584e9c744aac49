#!/bin/bash
# Train a CocoChorales 16 kHz stem model (reference training.sh experiment ids
# 65/93/94: strings/brass/woodwind).
set -euo pipefail
cd "$(dirname "$0")/.."

STEMS=${STEMS:-strings}
MODEL_DIR=${MODEL_DIR:-experiments/cocochorales_${STEMS}_16k}
mkdir -p "$MODEL_DIR"

python train.py \
  model_dir="$MODEL_DIR" \
  dset=CocoChorales_stems \
  network=cqtdiff+ \
  diff_params=edm_chorales \
  exp=CocoChorales_16k_8s \
  tester=only_uncond \
  logging=base_logging \
  "$@"
