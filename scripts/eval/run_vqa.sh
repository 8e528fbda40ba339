#!/usr/bin/env bash
# VQA-family suites (reference eval/vlm/eval/vqa/evaluate_vqa.py).
# METRIC selects the published scorer:
#   vqa       — EvalAI soft accuracy (vqav2/okvqa/textvqa/vizwiz;
#               rows carry gt_answers = the 10 annotator strings)
#   anls      — docvqa/infographicsvqa
#   relaxed   — chartqa (5% numeric tolerance)
#   vqa_exact — gqa/ocrvqa/ai2d
# Reference decode lengths: 10 tokens for short-answer suites, 100 for
# docvqa/chartqa/ocrvqa/infographicsvqa (ds_collections tables). ocrvqa
# scores with vqa_exact but decodes 100 tokens — override with
# VQA_MAXLEN=100 (the metric alone cannot distinguish it from gqa/ai2d).
set -euo pipefail
CKPT=${1:?checkpoint dir}
DATA=${2:?qa jsonl}
METRIC=${3:?vqa|anls|relaxed|vqa_exact}
OUT=${4:-results/${METRIC}.jsonl}
IMAGE_ROOT=${5:-}
shift $(( $# > 5 ? 5 : $# ))
case "$METRIC" in
  vqa|vqa_exact) MAXLEN=10 ;;
  *) MAXLEN=100 ;;
esac
MAXLEN=${VQA_MAXLEN:-$MAXLEN}
python -m bagel_tpu.eval.vlm_runner \
  --checkpoint "$CKPT" --data "$DATA" --out "$OUT" \
  --image_root "$IMAGE_ROOT" --score "$METRIC" --max_length "$MAXLEN" "$@"
