#!/usr/bin/env bash
# Score a GenEval layout directory END-TO-END with no external env:
#   scripts/eval/score_geneval.sh <imgdir>
# defaults to the built-in torchvision Mask R-CNN detector + the CLIP-free
# HSV color classifier (bagel_tpu/eval/detectors.py). NOTE: the default
# detector is score-shifted vs the reference's mmdet Mask2Former — for the
# published operating point pass a precomputed mmdet detections jsonl:
#   scripts/eval/score_geneval.sh <imgdir> --detections dets.jsonl
# or a custom detector: --detector pkg.module:fn
set -euo pipefail
OUTDIR=${1:?geneval results dir}
shift 1
python -m bagel_tpu.eval.gen_scorer --outdir "$OUTDIR" "$@"
