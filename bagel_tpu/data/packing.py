"""Packed-batch construction for training.

This module hosts the host-side packing logic (the reference's
PackedDataset.pack_sequence equivalent, data/dataset_base.py:306-475, arrives
with the data pipeline) plus `make_synthetic_batch`, a generator of valid
PackedTrainBatch instances used by tests, the multi-chip dryrun and
benchmarks.

Packing layout convention (static shapes):
- one buffer of `seq_len` token slots per packed sequence; slot seq_len-1 is
  a sink for padded scatter indexes (document_id 0, never attended, no loss).
- per-modality token payloads are padded to their own static sizes with
  scatter indexes pointing at the sink.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from bagel_tpu.configs import BagelConfig
from bagel_tpu.models.bagel import PackedTrainBatch
from bagel_tpu.ops.embeds import flattened_position_ids_extrapolate


def make_synthetic_batch(
    cfg: BagelConfig,
    rng: np.random.Generator,
    seq_len: int = 256,
    n_text: int = 32,
    vit_hw: tuple = (28, 28),
    vae_hw: tuple = (32, 32),
) -> PackedTrainBatch:
    """One packed sample: [causal text | full vit image | noise vae image].

    Mirrors the structure PackedDataset emits for a unified sample
    (dataset_base.py:306-475): CE loss on text continuation, MSE loss on the
    noised VAE latent tokens, per-split attention modes causal/full/noise.
    """
    p_vit = cfg.vit.patch_size
    n_vit = (vit_hw[0] // p_vit) * (vit_hw[1] // p_vit)
    down = cfg.latent_downsample
    h, w = vae_hw[0] // down, vae_hw[1] // down
    n_vae = h * w
    total = n_text + n_vit + n_vae
    assert total <= seq_len - 1, f"{total} tokens > seq_len-1 {seq_len - 1}"
    sink = seq_len - 1

    text_ids = rng.integers(0, cfg.llm.vocab_size, n_text).astype(np.int32)
    text_idx = np.arange(n_text, dtype=np.int32)
    vit_idx = np.arange(n_text, n_text + n_vit, dtype=np.int32)
    vae_idx = np.arange(n_text + n_vit, total, dtype=np.int32)

    vit_patches = rng.standard_normal((n_vit, cfg.vit.patch_dim)).astype(np.float32)
    vit_pos = np.asarray(
        flattened_position_ids_extrapolate(
            vit_hw[0], vit_hw[1], p_vit, cfg.vit_max_num_patch_per_side
        )
    )
    vae_patches = rng.standard_normal(
        (n_vae, cfg.patch_latent_dim)
    ).astype(np.float32)
    vae_pos = np.asarray(
        flattened_position_ids_extrapolate(
            vae_hw[0], vae_hw[1], down, cfg.max_latent_size
        )
    )

    position_ids = np.zeros(seq_len, np.int32)
    position_ids[text_idx] = np.arange(n_text)
    position_ids[vit_idx] = n_text  # whole image shares one rope position
    position_ids[vae_idx] = n_text + 1

    document_id = np.zeros(seq_len, np.int32)
    document_id[:total] = 1
    fan_id = np.full(seq_len, -1, np.int32)
    fan_id[vit_idx] = 1  # 'full' split
    fan_id[vae_idx] = 2  # 'noise' split
    noise_id = np.full(seq_len, -1, np.int32)
    noise_id[vae_idx] = 2
    gen_mask = np.zeros(seq_len, bool)
    gen_mask[vae_idx] = True

    # CE: predict text token i+1 from position i
    ce_idx = text_idx[:-1]
    ce_labels = text_ids[1:]
    ce_weight = np.ones(n_text - 1, np.float32)

    raw_t = rng.standard_normal(()).astype(np.float32)  # one t per image
    vae_timesteps = np.full(n_vae, raw_t, np.float32)

    return PackedTrainBatch(
        text_ids=jnp.asarray(text_ids),
        text_idx=jnp.asarray(text_idx),
        vit_patches=jnp.asarray(vit_patches),
        vit_pos_ids=jnp.asarray(vit_pos),
        vit_seg_ids=jnp.ones(n_vit, jnp.int32),
        vit_idx=jnp.asarray(vit_idx),
        vae_patches=jnp.asarray(vae_patches),
        vae_pos_ids=jnp.asarray(vae_pos),
        vae_idx=jnp.asarray(vae_idx),
        vae_timesteps=jnp.asarray(vae_timesteps),
        position_ids=jnp.asarray(position_ids),
        document_id=jnp.asarray(document_id),
        fan_id=jnp.asarray(fan_id),
        noise_id=jnp.asarray(noise_id),
        gen_mask=jnp.asarray(gen_mask),
        ce_idx=jnp.asarray(ce_idx),
        ce_labels=jnp.asarray(ce_labels),
        ce_weight=jnp.asarray(ce_weight),
        mse_weight=jnp.ones(n_vae, jnp.float32),
    )


def stack_batches(batches) -> PackedTrainBatch:
    """Stack per-sequence batches into one leading batch axis."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *batches)
