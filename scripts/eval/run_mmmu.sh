#!/usr/bin/env bash
# MMMU: rows {image, question, options?, answer, category(subject)}.
# Add --think for the CoT variant (EVAL.md: ~+2%).
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mmmu qa jsonl}
OUT=${3:-results/mmmu.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score mmmu --max_length 1024 "$@"
