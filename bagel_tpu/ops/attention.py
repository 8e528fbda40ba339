"""Attention ops for packed multimodal sequences.

One attention *interface* serves every use in the framework, replacing the
reference's three kernels (flash_attn_varlen_func, flex_attention, SDPA —
qwen2_navit.py:24,43, autoencoder.py:60):

- `dot_attention`: XLA dot-general attention with an arbitrary boolean mask.
  fp32 logits/softmax, bf16-friendly inputs, GQA via reshape. XLA fuses this
  well on TPU up to moderate sequence lengths; the Pallas flash kernel
  (bagel_tpu/ops/flash.py) takes over for long sequences behind the same
  mask semantics.

Mask builders (all resolve to bool [.., Sq, Skv], True = attend):
- `cache_block_mask`: inference prefill/decode over a preallocated KV buffer
  (causal diagonal aligned bottom-right like flash_attn with kv_len>q_len).
- `segment_mask`: NaViT packed full attention within each segment (ViT).
- `train_packed_mask`: the composed causal/full/noise/document predicate from
  data_utils.create_sparse_mask:13-40.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def dot_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    precision=None,
) -> jax.Array:
    """Masked multi-head attention with GQA.

    Args:
      q: [B, Sq, H, D]
      k: [B, Skv, KH, D] with H % KH == 0
      v: [B, Skv, KH, D]
      mask: broadcastable to [B, 1, Sq, Skv] bool; True = may attend.
      scale: defaults to D**-0.5.
      precision: jax matmul precision. The default (None) uses the platform
        default — bf16 multiplies with fp32 accumulation on the MXU, which
        matches the reference's bf16 attention compute
        (qwen2_navit.py:337-339,555-557). Pass "float32" for full-precision
        golden comparisons.

    Returns [B, Sq, H, D] in q.dtype.
    """
    b, sq, h, d = q.shape
    _, skv, kh, _ = k.shape
    g = h // kh
    if scale is None:
        scale = d**-0.5

    qf = q.reshape(b, sq, kh, g, d)
    # logits [B, KH, G, Sq, Skv] in fp32
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qf, k,
        preferred_element_type=jnp.float32, precision=precision,
    )
    logits = logits * scale
    if mask is not None:
        if mask.ndim == 2:  # [Sq, Skv]
            mask = mask[None, None]
        elif mask.ndim == 3:  # [B, Sq, Skv]
            mask = mask[:, None]
        logits = jnp.where(mask[:, :, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # rows with no visible key produce NaN from softmax(-inf): zero them.
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.reshape(b, sq, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Mask builders
# ---------------------------------------------------------------------------


def cache_block_mask(
    kv_buf_len: int,
    block_len: int,
    past_len: jax.Array,
    q_valid_len: jax.Array,
    causal: bool,
) -> jax.Array:
    """Mask for a new block of queries attending over a KV ring buffer.

    The buffer holds `past_len[b]` past tokens at positions [0, past_len) and
    the new block written at [past_len, past_len + block_len). Matches
    flash_attn_varlen semantics with merged past+new keys
    (qwen2_navit.py:341-370): every query sees all past tokens; within the
    block, `causal=True` aligns the diagonal at the block start.

    Args:
      kv_buf_len: static buffer length (Skv).
      block_len: static new-block length (Sq).
      past_len: [B] int32 tokens already in the buffer.
      q_valid_len: [B] int32 valid queries in the block (rest is padding).
      causal: python bool.

    Returns bool [B, Sq, Skv].
    """
    qi = jnp.arange(block_len, dtype=jnp.int32)[None, :, None]  # [1, Sq, 1]
    kj = jnp.arange(kv_buf_len, dtype=jnp.int32)[None, None, :]  # [1, 1, Skv]
    past = past_len[:, None, None]
    valid = q_valid_len[:, None, None]
    if causal:
        visible = kj <= past + qi
    else:
        visible = kj < past + valid
    # keys beyond the written region are never visible; padded queries are
    # masked out (their outputs are discarded by the caller).
    visible = visible & (kj < past + valid) & (qi < valid)
    return visible


def segment_mask(segment_ids: jax.Array) -> jax.Array:
    """Full attention within equal segments; id 0 = padding (no attention).

    segment_ids: [B, S] int32. Returns bool [B, S, S].
    """
    a = segment_ids[:, :, None]
    b = segment_ids[:, None, :]
    return (a == b) & (a != 0)


def train_packed_mask(
    document_id: jax.Array,
    full_and_noise_id: jax.Array,
    noise_id: jax.Array,
) -> jax.Array:
    """Composed training mask over a packed sequence (data_utils.py:13-40).

    Args (all [S] int32):
      document_id: sample index per token, >=1; 0 for padding.
      full_and_noise_id: split index for tokens in 'full' or 'noise' splits,
        -1 elsewhere.
      noise_id: split index for tokens in 'noise' splits, -1 elsewhere.

    allowed(i, j) = same_document
                    & (causal(i >= j) | same full/noise split)
                    & !(key is noise token of a different noise split)

    Returns bool [S, S].
    """
    s = document_id.shape[0]
    i = jnp.arange(s, dtype=jnp.int32)[:, None]
    j = jnp.arange(s, dtype=jnp.int32)[None, :]
    causal = i >= j
    fan_q = full_and_noise_id[:, None]
    fan_k = full_and_noise_id[None, :]
    same_fan = (fan_q == fan_k) & (fan_q >= 0)
    noise_q = noise_id[:, None]
    noise_k = noise_id[None, :]
    remove_noise = ~((noise_k >= 0) & (noise_q != noise_k))
    same_doc = (document_id[:, None] == document_id[None, :]) & (
        document_id[:, None] != 0
    )
    return same_doc & (causal | same_fan) & remove_noise


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool mask -> additive bias (0 / -inf), the reference's
    nested_attention_masks representation (data_utils.py:99-101)."""
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)
