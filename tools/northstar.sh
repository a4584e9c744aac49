#!/usr/bin/env bash
# One-command checkpoint north-star runner (VERDICT r3 next-#7).
#
# BASELINE.md quality target: "match the reference LSD within 0.1 dB on
# MAESTRO blind BWE" with the published checkpoint.  This environment has
# zero egress, so the measurement has never run end-to-end; the day egress
# (or a local copy of the weights) exists, it is literally:
#
#   tools/northstar.sh --audio_dir /path/originals [--ref_dir /path/ref_out]
#
# which chains:
#   1. checkpoint resolution (local file, or HuggingFace auto-download of
#      MAESTRO_22k_8s-850000.pt — reference test.py:48-56 semantics),
#   2. the loader-time CQT frame self-check (fails loudly on a mismatched
#      frame convention — testers/tester.py:223-264),
#   3. tools/eval_lsd.py at fc=1000 and fc=3000 (the formal blind-BWE
#      protocol, OLA chunking, idempotent restart),
#   4. the verdict: |mean LSD delta ours-minus-reference| <= 0.1 dB when
#      --ref_dir is given, otherwise absolute LSD / high-band LSD report.
#
# Offline smoke (proves the whole chain without weights or egress, ~2 min):
#   tools/northstar.sh --tiny
set -euo pipefail

cd "$(dirname "$0")/.."

CKPT="MAESTRO_22k_8s-850000.pt"
AUDIO_DIR=""
REF_DIR=""
OUT_DIR="experiments/northstar"
TINY=0
FCS="1000 3000"
PRECISION="bf16"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --ckpt) CKPT="$2"; shift 2 ;;
    --audio_dir) AUDIO_DIR="$2"; shift 2 ;;
    --ref_dir) REF_DIR="$2"; shift 2 ;;
    --out_dir) OUT_DIR="$2"; shift 2 ;;
    --fc) FCS="$2"; shift 2 ;;
    --tiny) TINY=1; shift ;;
    --precision) PRECISION="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

# --precision int8: run the whole evaluation on the quantized conv path
# (incl. the quantized guidance cotangent), so the published-checkpoint
# LSD bar also validates the fast path the day weights exist
# (PROFILE.md round 6; same 0.1 dB verdict applies).
if [[ "$PRECISION" == "int8" ]]; then
  export BABE_PRECISION=int8 BABE_INT8_BWD=1
  OUT_DIR="${OUT_DIR}_int8"
elif [[ "$PRECISION" != "bf16" ]]; then
  echo "--precision must be bf16 or int8" >&2; exit 2
fi

if [[ "$TINY" == 1 ]]; then
  # self-contained offline proof: synthesize a tiny eval set, run the tiny
  # random-init model through the identical pipeline, check the report exists
  TMP="$(mktemp -d)"
  trap 'rm -rf "$TMP"' EXIT
  python - "$TMP" <<'EOF'
import sys, os, numpy as np
from babe_tpu.data.wavio import write_wav
d = os.path.join(sys.argv[1], "audio"); os.makedirs(d, exist_ok=True)
rng = np.random.default_rng(0)
t = np.arange(3 * 22050) / 22050
for i in range(2):
    x = 0.1 * np.sin(2 * np.pi * (330 + 110 * i) * t) \
        + 0.02 * rng.standard_normal(t.size)
    write_wav(os.path.join(d, f"item{i}.wav"), x.astype(np.float32), 22050)
EOF
  python tools/eval_lsd.py --tiny --audio_dir "$TMP/audio" \
      --out_dir "$TMP/out" --fc 1000
  test -f "$TMP/out/lsd_report.json"
  echo "NORTHSTAR TINY CHAIN: OK (pipeline proven offline; LSD numbers from"
  echo "a random-init tiny model are meaningless by construction)"
  exit 0
fi

if [[ -z "$AUDIO_DIR" ]]; then
  echo "--audio_dir is required (directory of original full-band wavs," >&2
  echo " e.g. the MAESTRO test split)" >&2
  exit 2
fi

# 1. resolve / download the checkpoint (test.py resolver)
CKPT_PATH="$(python - "$CKPT" <<'EOF'
import sys
from babe_tpu.config import default_config
import test as entry
args = default_config(["tester=blind_bwe", f"tester.checkpoint={sys.argv[1]}"])
print(entry._resolve_checkpoint(args))
EOF
)"
CKPT_PATH="$(echo "$CKPT_PATH" | tail -1)"
echo "checkpoint: $CKPT_PATH"

# 2. load it once — the loader runs the CQT frame self-check and the
#    shape-mismatch diagnostics; a mismatched frame fails here, before any
#    expensive sampling
python - "$CKPT_PATH" <<'EOF'
import sys
from babe_tpu.api import BABE
m = BABE.load(sys.argv[1], overrides=["tester.T=2"])
print("frame self-check + checkpoint load: OK")
EOF

# 3. the formal blind-BWE LSD evaluation at both cutoffs
REF_ARG=()
[[ -n "$REF_DIR" ]] && REF_ARG=(--ref_dir "$REF_DIR")
# shellcheck disable=SC2086
python tools/eval_lsd.py --audio_dir "$AUDIO_DIR" --out_dir "$OUT_DIR" \
    --ckpt "$CKPT_PATH" --fc $FCS "${REF_ARG[@]}"

# 4. verdict vs the 0.1 dB bar
python - "$OUT_DIR/lsd_report.json" "$REF_DIR" <<'EOF'
import json, sys
report = json.load(open(sys.argv[1]))
have_ref = len(sys.argv) > 2 and sys.argv[2]
ok = True
for fc, res in report.items():
    s = res["summary"]
    if have_ref and "lsd_delta_mean" in s:
        d = s["lsd_delta_mean"]
        verdict = "PASS" if abs(d) <= 0.1 else "FAIL"
        ok &= abs(d) <= 0.1
        print(f"fc={fc}: mean LSD delta ours-minus-ref = {d:+.4f} dB "
              f"(bar: |delta| <= 0.1) -> {verdict}")
    else:
        print(f"fc={fc}: mean LSD {s.get('lsd_ours_mean')} dB, high-band "
              f"{s.get('lsd_hb_ours_mean')} dB (no --ref_dir: absolute only)")
if have_ref:
    print("NORTHSTAR:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
EOF
