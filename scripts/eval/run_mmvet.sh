#!/usr/bin/env bash
# MM-Vet: free-form answers; the published metric is GPT-judged — this
# produces the predictions jsonl for the judge (scorers.judge.run_judge).
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?mmvet qa jsonl}
OUT=${3:-results/mmvet.jsonl}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --max_length 512 "$@"
