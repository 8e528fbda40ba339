"""Chunked packed-mask attention for training (memory-efficient, exact).

At the reference's training sequence lengths (36,864 packed tokens,
TRAIN.md:124) a dense [S, S] mask/logits materialization needs O(150 GB) —
the reference leans on flex_attention's Triton codegen there. The TPU
answer here: process queries in chunks of `chunk` rows against the full KV,
computing the composed causal/full/noise/document mask (data_utils.py:13-40
semantics) from per-token metadata *inside* each chunk. Peak memory drops
from O(S^2) to O(chunk * S); jax.checkpoint on the chunk body keeps the
backward pass at the same footprint. Fully differentiable — no custom VJP.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _chunk_mask(doc_q, fan_q, noi_q, q_pos, doc, fan, noi):
    """[bq, S] slice of train_packed_mask."""
    s = doc.shape[0]
    k_pos = jnp.arange(s, dtype=jnp.int32)
    causal = q_pos[:, None] >= k_pos[None, :]
    same_doc = (doc_q[:, None] == doc[None, :]) & (doc_q[:, None] != 0)
    same_fan = (fan_q[:, None] == fan[None, :]) & (fan_q[:, None] >= 0)
    remove_noise = ~((noi[None, :] >= 0) & (noi_q[:, None] != noi[None, :]))
    return same_doc & (causal | same_fan) & remove_noise


def chunked_packed_attention(
    q: jax.Array,  # [S, H, D]
    k: jax.Array,  # [S, KH, D]
    v: jax.Array,
    document_id: jax.Array,  # [S] int32
    fan_id: jax.Array,
    noise_id: jax.Array,
    chunk: int = 512,
    scale: Optional[float] = None,
    precision=None,
) -> jax.Array:
    """Exact masked GQA attention, O(chunk * S) memory. S % chunk == 0."""
    s, h, d = q.shape
    kh = k.shape[1]
    g = h // kh
    if scale is None:
        scale = d**-0.5
    assert s % chunk == 0, (s, chunk)
    n_chunks = s // chunk

    qc = q.reshape(n_chunks, chunk, kh, g, d)
    doc_c = document_id.reshape(n_chunks, chunk)
    fan_c = fan_id.reshape(n_chunks, chunk)
    noi_c = noise_id.reshape(n_chunks, chunk)
    pos_c = jnp.arange(s, dtype=jnp.int32).reshape(n_chunks, chunk)

    @jax.checkpoint
    def chunk_fn(q_blk, doc_q, fan_q, noi_q, q_pos):
        mask = _chunk_mask(doc_q, fan_q, noi_q, q_pos,
                           document_id, fan_id, noise_id)
        logits = jnp.einsum(
            "qhgd,khd->hgqk", q_blk, k,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        logits = jnp.where(mask[None, None], logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = jnp.where(mask[None, None], p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum(
            "hgqk,khd->qhgd", (p / jnp.maximum(l, 1e-20)).astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=precision,
        )
        return out.reshape(chunk, h, d).astype(q.dtype)

    def body(_, xs):
        return None, chunk_fn(*xs)

    _, out = lax.scan(body, None, (qc, doc_c, fan_c, noi_c, pos_c))
    return out.reshape(s, h, d)
