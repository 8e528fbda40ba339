#!/usr/bin/env bash
# GEdit-Bench editing eval (reference scripts/eval/run_gedit.sh operating
# point: text_channel renorm, cfg_text 4 / cfg_img 1.5, max_latent_size 64).
# Score afterwards with the VIEScore judge (bagel_tpu.eval.scorers.judge:
# gedit_summarize) or the official viescore pipeline.
set -euo pipefail
CKPT=${1:?checkpoint dir}
METADATA=${2:?gedit metadata jsonl with prompt+image rows}
OUTDIR=${3:-results/gedit}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.gen_runner \
  --checkpoint "$CKPT" --metadata "$METADATA" --outdir "$OUTDIR" \
  --image_root "$IMAGE_ROOT" \
  --cfg_text_scale 4.0 --cfg_img_scale 1.5 --cfg_renorm_type text_channel \
  --num_timesteps 50 --timestep_shift 3.0 --max_latent_size 64 "$@"
