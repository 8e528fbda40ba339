#!/usr/bin/env bash
# Launch training (single- or multi-host). On multi-host TPU pods, run this
# on every host with JAX_COORDINATOR_ADDRESS set; jax.distributed handles the
# rest — there is no torchrun layer.
set -euo pipefail

CKPT_DIR=${CKPT_DIR:-results/ckpt}
DATA_CONFIG=${DATA_CONFIG:-data/configs/example.yaml}
INIT_CKPT=${INIT_CKPT:-}  # HF-released BAGEL checkpoint to finetune

python -m bagel_tpu.train.driver \
  --dataset_config "$DATA_CONFIG" \
  ${INIT_CKPT:+--init_checkpoint "$INIT_CKPT"} \
  --ckpt_dir "$CKPT_DIR" \
  --lr 2e-5 --lr_scheduler cosine --warmup_steps 2000 \
  --total_steps 500000 --save_every 2000 --log_every 10 \
  --ce_weight 0.25 --mse_weight 1.0 --ema 0.9999 \
  --expected_num_tokens 32768 --max_num_tokens 36864 \
  --auto_resume \
  "$@"
