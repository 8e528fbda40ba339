#!/usr/bin/env bash
# MathVista: numeric/choice answers; offline numeric scorer by default (the
# reference uses a GPT extractor — plug one via scorers.judge.run_judge).
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mathvista qa jsonl}
OUT=${3:-results/mathvista.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score numeric --max_length 1024 "$@"
