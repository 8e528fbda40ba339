"""Training step: loss, optimizer, EMA — the reference train loop's math
(train/pretrain_unified_navit.py:666-734) as one jitted function.

Loss normalization matches the reference exactly: per-token CE (optionally
len2weight-reweighted) and per-token MSE are summed and divided by *global*
token counts (:695-724). The reference needs explicit all_reduce + FSDP
gradient averaging for this; under GSPMD jit the batch arrays are globally
sharded, so plain jnp.sum IS the global sum and no collective code exists
here at all.

Optimizer: AdamW(b1, b2, eps=1e-15, wd=0) + global-norm clip + warmup
constant/cosine schedules (:581-600). EMA over parameters (fsdp_utils.py:
255-269 equivalent, a tree_map here).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from bagel_tpu.configs import BagelConfig
from bagel_tpu.models.bagel import (
    PackedTrainBatch,
    bagel_forward_train,
    bagel_forward_train_pp,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    ema_params: Optional[dict]
    step: jax.Array


def make_lr_schedule(
    lr: float,
    warmup_steps: int = 2000,
    total_steps: int = 500_000,
    kind: str = "constant",
    min_lr: float = 1e-7,
):
    if kind == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.constant_schedule(lr)],
            [warmup_steps],
        )
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, total_steps, end_value=min_lr
        )
    raise ValueError(kind)


# Frozen sin-cos position tables: persistent buffers in the reference
# (modeling_utils.py:127-144 PositionEmbedding registers them non-trainable),
# regenerated from config here (SURVEY §5.4 resolution retargeting) — they
# must never receive optimizer updates.
FROZEN_BUFFERS = ("vit_pos_embed", "latent_pos_embed")


def trainable_mask(params: dict, frozen=()) -> dict:
    """True/False pytree over top-level param groups: False for frozen
    modules (--freeze_llm/vit/vae, pretrain_unified_navit.py:541-551) and
    always for the sin-cos buffer tables."""
    off = set(frozen) | set(FROZEN_BUFFERS)
    return {
        k: jax.tree.map(lambda _: k not in off, v) for k, v in params.items()
    }


def freeze_stop_gradient(params: dict, frozen=()) -> dict:
    """stop_gradient over frozen top-level groups so XLA prunes their
    backward compute entirely (the reference sets requires_grad=False)."""
    off = set(frozen) | set(FROZEN_BUFFERS)
    return {
        k: (jax.lax.stop_gradient(v) if k in off else v)
        for k, v in params.items()
    }


def opt_state_to_memory_kind(opt_state, kind: str):
    """Move every array leaf of an optimizer state to `kind`
    ("pinned_host" / "device") keeping its sharding layout.

    TPU-native analogue of the reference's FSDP cpu_offload flag
    (pretrain_unified_navit.py:376-380): fp32 Adam moments for 7B are
    ~56 GB — far beyond a 16 GB v5e chip's HBM budget at small mesh
    sizes — so --optimizer_offload keeps them resident in host memory and
    round-trips them through HBM only inside the update step. Frozen
    groups' MaskedNodes carry no arrays and pass through untouched."""

    def move(x):
        if isinstance(x, jax.Array) and hasattr(x.sharding, "with_memory_kind"):
            return jax.device_put(x, x.sharding.with_memory_kind(kind))
        return x

    return jax.tree.map(move, opt_state)


def make_optimizer(
    lr_schedule,
    beta1: float = 0.9,
    beta2: float = 0.95,
    eps: float = 1e-15,
    max_grad_norm: float = 1.0,
    frozen=(),
) -> optax.GradientTransformation:
    """AdamW chain with frozen modules masked out: masked leaves carry no
    Adam moments (an unfrozen-by-accident VAE costs ~0.7 GB of fp32
    moments at 7B scale) and receive no updates. The masked wrapper is
    applied only when something is actually frozen — wrapping always would
    change the opt_state pytree structure and break full-state restore of
    checkpoints saved by unfrozen runs."""
    inner = optax.chain(
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.scale_by_learning_rate(lr_schedule),
    )
    if frozen:
        inner = optax.masked(
            inner, lambda params: trainable_mask(params, frozen)
        )
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)


def init_train_state(
    params: dict, tx: optax.GradientTransformation, use_ema: bool = True
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        step=jnp.zeros((), jnp.int32),
    )


def compute_losses(
    params: dict,
    cfg: BagelConfig,
    batch: PackedTrainBatch,  # leading batch axis on every leaf
    noise: jax.Array,  # [B, n_vae, pd]
    ce_weight: float = 0.25,
    mse_weight: float = 1.0,
    precision=None,
    attn_chunk=None,
    context_parallel=None,
    sparse_block=None,
    pipeline_parallel=None,  # (Mesh, axis_name): GPipe over the layer stack
    expert_parallel=None,  # (Mesh, axis_name): MoT experts sharded 2-way
    remat="full",  # per-layer activation checkpointing: full | dots | none
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    if pipeline_parallel is not None:
        # batch rows become pipeline microbatches flowing through the
        # stage-sharded layer stack (parallel/pipeline.py)
        pp_mesh, pp_axis = pipeline_parallel
        outs = bagel_forward_train_pp(
            params, cfg, batch, noise, pp_mesh, pp_axis,
            precision=precision, attn_chunk=attn_chunk, remat=remat,
        )
    elif context_parallel is not None:
        # ring attention shard_maps inside the forward; vmap over batch is
        # not supported — context parallelism targets one huge sequence.
        assert batch.position_ids.shape[0] == 1, "context_parallel needs B=1"
        one = jax.tree.map(lambda x: x[0], batch)
        outs = bagel_forward_train(params, cfg, one, noise[0], precision,
                                   context_parallel=context_parallel,
                                   remat=remat)
        outs = jax.tree.map(lambda x: x[None], outs)
    else:
        outs = jax.vmap(
            lambda b, n: bagel_forward_train(params, cfg, b, n, precision,
                                             attn_chunk=attn_chunk,
                                             sparse_block=sparse_block,
                                             expert_parallel=expert_parallel,
                                             remat=remat)
        )(batch, noise)

    ce_w = outs["ce_weight"]
    ce_cnt = jnp.maximum(jnp.sum(ce_w), 1e-8)
    ce = jnp.sum(outs["ce"] * ce_w) / ce_cnt

    loss = ce_weight * ce
    metrics = {"ce": ce, "ce_tokens": jnp.sum(ce_w > 0)}
    if "mse" in outs:
        mse_w = outs["mse_weight"]
        mse_cnt = jnp.maximum(jnp.sum(mse_w), 1e-8)
        mse = jnp.sum(jnp.mean(outs["mse"], axis=-1) * mse_w) / mse_cnt
        loss = loss + mse_weight * mse
        metrics["mse"] = mse
        metrics["mse_tokens"] = jnp.sum(mse_w > 0)
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(
    cfg: BagelConfig,
    tx: optax.GradientTransformation,
    ce_weight: float = 0.25,
    mse_weight: float = 1.0,
    ema_decay: float = 0.9999,
    precision=None,
    frozen=(),
    remat="full",
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    frozen: top-level param groups ("llm", "vit", "vae") to freeze — pass
    the same tuple to make_optimizer so moments are masked too."""

    def train_step(state: TrainState, batch: PackedTrainBatch, rng: jax.Array):
        b = batch.position_ids.shape[0]
        n_vae = batch.vae_patches.shape[1]
        pd = batch.vae_patches.shape[2]
        noise = jax.random.normal(rng, (b, n_vae, pd), jnp.float32)

        def loss_fn(params):
            return compute_losses(
                freeze_stop_gradient(params, frozen), cfg, batch, noise,
                ce_weight, mse_weight, precision, remat=remat
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        if state.ema_params is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1 - ema_decay),
                state.ema_params, params,
            )
        else:
            ema = None
        new_state = TrainState(
            params=params, opt_state=opt_state, ema_params=ema,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step
