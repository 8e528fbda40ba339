#!/usr/bin/env bash
# RISEBench editing eval (gen_images_mp_rise.py protocol; --think for CoT).
set -euo pipefail
CKPT=${1:?checkpoint dir}
METADATA=${2:?rise metadata jsonl}
OUTDIR=${3:-results/rise}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.gen_runner \
  --checkpoint "$CKPT" --metadata "$METADATA" --outdir "$OUTDIR" \
  --image_root "$IMAGE_ROOT" --think \
  --cfg_text_scale 4.0 --cfg_img_scale 2.0 --cfg_renorm_type text_channel \
  --num_timesteps 50 --timestep_shift 3.0 --max_latent_size 64 "$@"

# Scoring (after generation; needs an external GPT judge callable and the
# canonical RISE prompt set as JSON):
#   python -m bagel_tpu.eval.judge_scorer rise \
#     --data "$METADATA" --results_dir "$OUTDIR" --input_dir "$IMAGE_ROOT" \
#     --prompts rise_prompts.json --judge my_judges:gpt4o
