#!/bin/bash
# Run zero-shot blind BWE inference (TPU-native equivalent of the reference
# testing_blindbwe.sh:26-85).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR=${MODEL_DIR:-experiments/maestro_22k_8s}
CKPT=${CKPT:-MAESTRO_22k_8s-850000.pt}   # published torch ckpt name works too

python test.py \
  model_dir="$MODEL_DIR" \
  dset=maestro_allyears \
  network=cqtdiff+ \
  diff_params=edm \
  exp=maestro22k_8s \
  tester=blind_bwe \
  logging=base_logging \
  tester.checkpoint="$CKPT" \
  tester.filter_out_cqt_DC_Nyq=True \
  "$@"
