#!/usr/bin/env bash
# KRIS-Bench editing eval (gen_images_mp_kris.py: cfg_text 4, cfg_img 2,
# cfg_interval [0,1], text_channel renorm; --think for the CoT variant).
set -euo pipefail
CKPT=${1:?checkpoint dir}
METADATA=${2:?kris metadata jsonl}
OUTDIR=${3:-results/kris}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.gen_runner \
  --checkpoint "$CKPT" --metadata "$METADATA" --outdir "$OUTDIR" \
  --image_root "$IMAGE_ROOT" \
  --cfg_text_scale 4.0 --cfg_img_scale 2.0 --cfg_renorm_type text_channel \
  --cfg_interval_min 0.0 \
  --num_timesteps 50 --timestep_shift 3.0 --max_latent_size 64 "$@"

# Scoring (after generation; needs an external GPT judge callable):
#   python -m bagel_tpu.eval.judge_scorer kris \
#     --bench_dir KRIS_Bench --results_dir "$OUTDIR" \
#     --judge my_judges:gpt4o --out "$OUTDIR/scores"
