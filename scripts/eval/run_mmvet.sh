#!/usr/bin/env bash
# MM-Vet: free-form answers graded by the published GPT protocol
# (scorers/mmvet.py — <AND>/<OR> algebra + capability tables; pass
# --judge pkg.mod:fn for a live judge, else the containment fallback).
# Reference decode length: evaluate_mmvet.py max_new_tokens=1000.
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mmvet qa jsonl}
OUT=${3:-results/mmvet.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score mmvet --max_length 1000 "$@"
