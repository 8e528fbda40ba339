#!/usr/bin/env bash
# POPE object-hallucination yes/no F1.
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?pope qa jsonl}
OUT=${3:-results/pope.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score pope --max_length 16 "$@"
