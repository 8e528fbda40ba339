"""Ring attention: context parallelism over the ICI ring (extension).

The reference has no sequence/context parallelism at all (SURVEY §2.6, §5.7
— long sequences are handled per-device by NaViT packing). This op extends
the framework beyond parity: shard the sequence over a mesh axis, keep Q
local, and rotate KV blocks around the ring with jax.lax.ppermute while
folding online-softmax partials — exact attention over sequences far beyond
one chip's HBM.

Use under shard_map with the sequence dim sharded on `axis_name`:

    out = shard_map(
        partial(ring_attention, axis_name="sp", causal=True),
        mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
    )(q, k, v)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jax.Array,  # [B, Sq_local, H, D]
    k: jax.Array,  # [B, Skv_local, KH, D]
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact GQA attention over a sequence sharded on `axis_name`.

    Shard i holds global positions [i * S_local, (i+1) * S_local); causal
    masking uses global positions. Each of the axis_size ring steps computes
    the local Q block against one (rotating) KV block and merges it into the
    running (m, l, acc) online-softmax state.
    """
    b, sq, h, d = q.shape
    _, skv, kh, _ = k.shape
    g = h // kh
    if scale is None:
        scale = d**-0.5
    n = jax.lax.axis_size(axis_name)  # static inside shard_map
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.reshape(b, sq, kh, g, d)
    q_pos = my_idx * sq + jnp.arange(sq)

    def block(k_blk, v_blk, owner):
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, k_blk,
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            k_pos = owner * skv + jnp.arange(skv)
            mask = q_pos[:, None] >= k_pos[None, :]
            s = jnp.where(mask[None, None, None], s, NEG_INF)
        m_b = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m_b)
        if causal:
            p = jnp.where(mask[None, None, None], p, 0.0)
        l_b = jnp.sum(p, axis=-1, keepdims=True)
        acc_b = jnp.einsum(
            "bhgqk,bkhd->bhgqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return m_b, l_b, acc_b

    m = jnp.full((b, kh, g, sq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, kh, g, sq, 1), jnp.float32)
    acc = jnp.zeros((b, kh, g, sq, d), jnp.float32)
    k_blk, v_blk, owner = k, v, my_idx
    for _ in range(n):
        m_b, l_b, acc_b = block(k_blk, v_blk, owner)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        l = l * alpha + l_b * beta
        acc = acc * alpha + acc_b * beta
        m = m_new
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        owner = jax.lax.ppermute(owner, axis_name, perm)

    out = acc / jnp.maximum(l, 1e-20)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, sq, h, d).astype(q.dtype)


def ring_packed_attention(
    q: jax.Array,  # [B, S_local, H, D]
    k: jax.Array,  # [B, S_local, KH, D]
    v: jax.Array,
    doc_id: jax.Array,  # [S_local] int32 per-token sample id (0 = padding)
    fan_id: jax.Array,  # [S_local] full/noise split id, -1 elsewhere
    noise_id: jax.Array,  # [S_local] noise split id, -1 elsewhere
    axis_name: str,
    scale: Optional[float] = None,
) -> jax.Array:
    """Ring attention under the packed-training mask predicate
    (ops.attention.train_packed_mask / data_utils.py:13-40) — context
    parallelism for the training forward, an extension the reference lacks.

    The sequence (and its mask metadata) is sharded on `axis_name`; KV
    blocks and their metadata rotate around the ring while the local Q block
    folds online-softmax partials. Exact vs the dense-mask path.
    """
    b, sq, h, d = q.shape
    kh = k.shape[2]
    g = h // kh
    if scale is None:
        scale = d**-0.5
    n = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.reshape(b, sq, kh, g, d)
    q_pos = my_idx * sq + jnp.arange(sq)

    def block_mask(owner, doc_k, fan_k, noi_k):
        k_pos = owner * sq + jnp.arange(sq)
        causal = q_pos[:, None] >= k_pos[None, :]
        same_fan = (fan_id[:, None] == fan_k[None, :]) & (fan_id[:, None] >= 0)
        remove_noise = ~(
            (noi_k[None, :] >= 0) & (noise_id[:, None] != noi_k[None, :])
        )
        same_doc = (doc_id[:, None] == doc_k[None, :]) & (doc_id[:, None] != 0)
        return same_doc & (causal | same_fan) & remove_noise

    def block(k_blk, v_blk, owner, doc_k, fan_k, noi_k):
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, k_blk,
            preferred_element_type=jnp.float32,
        ) * scale
        mask = block_mask(owner, doc_k, fan_k, noi_k)[None, None, None]
        s = jnp.where(mask, s, NEG_INF)
        m_b = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.where(mask, jnp.exp(s - m_b), 0.0)
        l_b = jnp.sum(p, axis=-1, keepdims=True)
        acc_b = jnp.einsum(
            "bhgqk,bkhd->bhgqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return m_b, l_b, acc_b

    m = jnp.full((b, kh, g, sq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, kh, g, sq, 1), jnp.float32)
    acc = jnp.zeros((b, kh, g, sq, d), jnp.float32)
    state = (k, v, my_idx, doc_id, fan_id, noise_id)
    for _ in range(n):
        k_blk, v_blk, owner, doc_k, fan_k, noi_k = state
        m_b, l_b, acc_b = block(k_blk, v_blk, owner, doc_k, fan_k, noi_k)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        l = l * alpha + l_b * beta
        acc = acc * alpha + acc_b * beta
        m = m_new
        state = tuple(
            jax.lax.ppermute(x, axis_name, perm) for x in state
        )

    out = acc / jnp.maximum(l, 1e-20)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, sq, h, d).astype(q.dtype)
