#!/usr/bin/env bash
# ImgEdit-Bench editing eval (gen_images_mp_imgedit.py defaults: cfg_text 4,
# cfg_img 2, text_channel renorm). Score with the GPT judge
# (imgedit/basic_bench.py protocol) via bagel_tpu.eval.scorers.judge.
set -euo pipefail
CKPT=${1:?checkpoint dir}
METADATA=${2:?imgedit metadata jsonl}
OUTDIR=${3:-results/imgedit}
IMAGE_ROOT=${4:-}
shift $(( $# > 4 ? 4 : $# ))
python -m bagel_tpu.eval.gen_runner \
  --checkpoint "$CKPT" --metadata "$METADATA" --outdir "$OUTDIR" \
  --image_root "$IMAGE_ROOT" \
  --cfg_text_scale 4.0 --cfg_img_scale 2.0 --cfg_renorm_type text_channel \
  --num_timesteps 50 --timestep_shift 3.0 --max_latent_size 64 "$@"

# Scoring (after generation; needs the benchmark's edit/prompts JSONs and an
# external GPT judge callable):
#   python -m bagel_tpu.eval.judge_scorer imgedit \
#     --edit_json basic_edit.json --results_dir "$OUTDIR" \
#     --origin_root imgs --prompts prompts.json \
#     --judge my_judges:gpt4o --out "$OUTDIR/imgedit_judge.jsonl"
