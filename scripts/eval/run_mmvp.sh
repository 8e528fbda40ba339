#!/usr/bin/env bash
# MMVP paired visual-pattern eval (reference eval/vlm/eval/mmvp/
# evaluate_mmvp.py): rows {image, question (with options appended),
# answer '(a)'/'(b)', options {A: ..., B: ...}}; consecutive rows pair;
# the published number credits a pair only when both are right.
# Reference decode length: max_new_tokens=100.
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mmvp qa jsonl}
OUT=${3:-results/mmvp.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score mmvp --max_length 100 "$@"
