#!/usr/bin/env bash
# VLM benchmarks (MME/MMBench/POPE/VQA-style jsonl).
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?qa jsonl}
IMAGES=${3:?image root}
OUT=${4:-results/vlm_results.jsonl}
SCORE=${5:-yesno}  # yesno | choice | exact
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --image_root "$IMAGES" \
  --out "$OUT" --score "$SCORE" "$@"
