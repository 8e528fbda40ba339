#!/usr/bin/env bash
# MMBench: rows {image, question(+options text), options{A..E}, answer,
# index (circular variants offset by 1e6), category}.
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mmbench qa jsonl}
OUT=${3:-results/mmbench.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score mmbench --max_length 24 "$@"
