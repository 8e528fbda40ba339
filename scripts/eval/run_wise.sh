#!/usr/bin/env bash
# WISE: think-mode two-phase generation (reasoning text then image).
set -euo pipefail
CKPT=${1:?checkpoint dir}
METADATA=${2:?wise prompts jsonl}
OUTDIR=${3:-results/wise}
python -m bagel_tpu.eval.gen_runner \
  --checkpoint "$CKPT" --metadata "$METADATA" --outdir "$OUTDIR" \
  --think --cfg_text_scale 4.0 --num_timesteps 50 --timestep_shift 3.0 "$@"
