#!/usr/bin/env bash
# Score a GenEval layout directory. Detections come from the official mmdet
# Mask2Former (pass --detector pkg.module:fn) or a precomputed jsonl.
set -euo pipefail
OUTDIR=${1:?geneval results dir}
shift 1
python -m bagel_tpu.eval.gen_scorer --outdir "$OUTDIR" "$@"
