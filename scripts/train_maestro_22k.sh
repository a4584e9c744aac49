#!/bin/bash
# Train the flagship MAESTRO 22.05 kHz model (TPU-native equivalent of the
# reference SLURM launcher experiment id 54, training.sh:33-80).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR=${MODEL_DIR:-experiments/maestro_22k_8s}
mkdir -p "$MODEL_DIR"

python train.py \
  model_dir="$MODEL_DIR" \
  dset=maestro_allyears \
  network=cqtdiff+ \
  diff_params=edm \
  exp=maestro22k_8s \
  tester=only_uncond \
  logging=base_logging \
  "$@"
