#!/usr/bin/env bash
# GenEval image generation. Output uses the official layout; score with
# scripts/eval/score_geneval.sh (built-in detector, no external env) or the
# upstream mmdet-based evaluator for the published operating point.
set -euo pipefail
CKPT=${1:?checkpoint dir}
METADATA=${2:?geneval evaluation_metadata.jsonl}
OUTDIR=${3:-results/geneval}
python -m bagel_tpu.eval.gen_runner \
  --checkpoint "$CKPT" --metadata "$METADATA" --outdir "$OUTDIR" \
  --cfg_text_scale 4.0 --cfg_img_scale 1.0 --num_timesteps 50 \
  --timestep_shift 3.0 "$@"
