#!/usr/bin/env bash
# MME understanding eval: rows {image, question, answer(yes/no),
# category(task)}; prints the published acc/acc+ score tables.
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mme qa jsonl}
OUT=${3:-results/mme.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score mme --max_length 16 "$@"
