"""Block-sparse Pallas flash attention for the packed training forward.

The reference trains with flex_attention over a compiled 128-block mask
(bagel.py:156-161) built from the causal/full/noise/document predicate
(data_utils.py:13-40). At 36k packed tokens holding many samples, most
(q-block, kv-block) tiles are fully masked — cross-document — and
flex_attention skips them. This kernel is the TPU equivalent:

- Per-block metadata summaries (document-id / fan-id ranges) are reduced in
  XLA; a tile is LIVE iff the doc ranges intersect AND (the tile touches
  the causal triangle OR the fan ranges intersect). remove_noise only ever
  *removes* elements, so it never changes liveness.
- For each q block, the live kv block indices are compacted into a
  scalar-prefetched table; the kernel's kv grid dimension walks that table.
  Dead steps repeat the previous block index — Pallas skips the DMA for a
  repeated index — and `pl.when` skips the compute, so dead tiles cost
  neither bandwidth nor MXU time (the splash-attention indexing pattern,
  pallas_guide.md PrefetchScalarGridSpec).
- Inside live tiles, the exact per-element mask is applied from the
  metadata blocks (same predicate as ops.attention.train_packed_mask).
- Gradient-exactness: custom VJP whose backward recomputes attention with
  the chunked XLA path (ops/chunked.py) — the same function, so gradients
  are exact; forward memory stays O(block^2), backward O(chunk*S).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_BIG = jnp.int32(2**30)


def block_liveness(
    document_id: jax.Array,  # [S] int32 (0 = padding)
    fan_id: jax.Array,  # [S] int32 (-1 = none)
    block_q: int,
    block_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Compact per-q-block live kv-block tables.

    Returns (live_idx [nq, nk] int32, live_cnt [nq] int32): for q block i,
    live_idx[i, :cnt] are the ascending kv block indices that can contain
    visible keys; entries beyond cnt repeat the last live index (repeated
    index = no re-DMA in the kernel). Rows with no live block point at
    block 0 with cnt 0.
    """
    s = document_id.shape[0]
    nq, nk = s // block_q, s // block_k

    def ranges(ids, blocks, size, none_val):
        b = ids.reshape(blocks, size)
        valid = b != none_val
        lo = jnp.where(valid, b, _BIG).min(axis=1)
        hi = jnp.where(valid, b, -_BIG).max(axis=1)
        return lo, hi, valid.any(axis=1)

    dq_lo, dq_hi, dq_any = ranges(document_id, nq, block_q, 0)
    dk_lo, dk_hi, dk_any = ranges(document_id, nk, block_k, 0)
    fq_lo, fq_hi, fq_any = ranges(
        jnp.where(fan_id >= 0, fan_id, -1), nq, block_q, -1
    )
    fk_lo, fk_hi, fk_any = ranges(
        jnp.where(fan_id >= 0, fan_id, -1), nk, block_k, -1
    )

    doc_possible = (
        (dk_lo[None, :] <= dq_hi[:, None])
        & (dk_hi[None, :] >= dq_lo[:, None])
        & dq_any[:, None] & dk_any[None, :]
    )
    # causal triangle touches the tile iff the last q position >= first k
    q_end = (jnp.arange(nq, dtype=jnp.int32) + 1) * block_q - 1
    k_start = jnp.arange(nk, dtype=jnp.int32) * block_k
    causal_possible = q_end[:, None] >= k_start[None, :]
    fan_possible = (
        (fk_lo[None, :] <= fq_hi[:, None])
        & (fk_hi[None, :] >= fq_lo[:, None])
        & fq_any[:, None] & fk_any[None, :]
    )
    live = doc_possible & (causal_possible | fan_possible)  # [nq, nk]

    cnt = live.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(~live, axis=1, stable=True).astype(jnp.int32)
    last = order[jnp.arange(nq), jnp.maximum(cnt - 1, 0)]
    steps = jnp.arange(nk, dtype=jnp.int32)[None, :]
    live_idx = jnp.where(steps < cnt[:, None], order, last[:, None])
    return live_idx, cnt


def _sparse_kernel(
    live_idx_ref, live_cnt_ref,  # scalar prefetch [nq, nk], [nq]
    q_ref, k_ref, v_ref,  # [1, bq, D], [1, bk, D]
    docq_ref, fanq_ref, noiq_ref,  # [1, 1, bq]
    dock_ref, fank_ref, noik_ref,  # [1, 1, bk]
    o_ref,
    m_scr, l_scr, acc_scr,
    *, block_q: int, block_k: int, scale: float,
):
    iq = pl.program_id(1)
    step = pl.program_id(2)
    nsteps = pl.num_programs(2)

    @pl.when(step == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(step < live_cnt_ref[iq])
    def _compute():
        kb = live_idx_ref[iq, step]
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bq, bk]

        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        q_pos = iq * block_q + rows
        k_pos = kb * block_k + cols
        doc_q = docq_ref[0, 0][:, None]
        doc_k = dock_ref[0, 0][None, :]
        fan_q = fanq_ref[0, 0][:, None]
        fan_k = fank_ref[0, 0][None, :]
        noi_q = noiq_ref[0, 0][:, None]
        noi_k = noik_ref[0, 0][None, :]
        same_doc = (doc_q == doc_k) & (doc_q != 0)
        same_fan = (fan_q == fan_k) & (fan_q >= 0)
        remove_noise = jnp.logical_not((noi_k >= 0) & (noi_q != noi_k))
        mask = same_doc & ((q_pos >= k_pos) | same_fan) & remove_noise
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(step == nsteps - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _sparse_forward(
    q, k, v, document_id, fan_id, noise_id,
    *, block_q: int, block_k: int, scale: float, interpret: bool,
):
    s, h, d = q.shape
    kh = k.shape[1]
    g = h // kh
    nq, nk = s // block_q, s // block_k
    live_idx, live_cnt = block_liveness(document_id, fan_id, block_q, block_k)

    qt = q.transpose(1, 0, 2)  # [H, S, D]
    kt = k.transpose(1, 0, 2)  # [KH, S, D]
    vt = v.transpose(1, 0, 2)
    # metadata as [n, 1, block]: TPU lowering needs the block's last two
    # dims (8, 128)-divisible or equal to the array dims — (1, block) rows
    # of a [n, block] array violate that, (1, 1, block) of [n, 1, block]
    # satisfies it
    docq = document_id.reshape(nq, 1, block_q)
    fanq = fan_id.reshape(nq, 1, block_q)
    noiq = noise_id.reshape(nq, 1, block_q)
    dock = document_id.reshape(nk, 1, block_k)
    fank = fan_id.reshape(nk, 1, block_k)
    noik = noise_id.reshape(nk, 1, block_k)

    def qmap(hh, qq, ss, live_idx, live_cnt):
        return (hh, qq, 0)

    def kvmap(hh, qq, ss, live_idx, live_cnt):
        return (hh // g, live_idx[qq, ss], 0)

    def qmeta(hh, qq, ss, live_idx, live_cnt):
        return (qq, 0, 0)

    def kmeta(hh, qq, ss, live_idx, live_cnt):
        return (live_idx[qq, ss], 0, 0)

    kernel = functools.partial(
        _sparse_kernel, block_q=block_q, block_k=block_k, scale=scale,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), qmap),
                pl.BlockSpec((1, block_k, d), kvmap),
                pl.BlockSpec((1, block_k, d), kvmap),
                pl.BlockSpec((1, 1, block_q), qmeta),
                pl.BlockSpec((1, 1, block_q), qmeta),
                pl.BlockSpec((1, 1, block_q), qmeta),
                pl.BlockSpec((1, 1, block_k), kmeta),
                pl.BlockSpec((1, 1, block_k), kmeta),
                pl.BlockSpec((1, 1, block_k), kmeta),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), qmap),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, d), jnp.float32),  # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((h, s, d), q.dtype),
        interpret=interpret,
    )(live_idx, live_cnt, qt, kt, vt, docq, fanq, noiq, dock, fank, noik)
    return out.transpose(1, 0, 2)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def sparse_packed_attention(
    q: jax.Array,  # [S, H, D]
    k: jax.Array,  # [S, KH, D]
    v: jax.Array,
    document_id: jax.Array,  # [S] int32
    fan_id: jax.Array,
    noise_id: jax.Array,
    block_q: int = 256,
    block_k: int = 256,
    scale: Optional[float] = None,
    interpret: bool = False,
    bwd_chunk: int = 512,
) -> jax.Array:
    """Exact packed-train-mask attention, skipping dead blocks. S must be a
    multiple of both block sizes (the packer's seq buckets guarantee it)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _sparse_forward(
        q, k, v, document_id, fan_id, noise_id,
        block_q=block_q, block_k=block_k, scale=scale, interpret=interpret,
    )


def _fwd(q, k, v, doc, fan, noi, block_q, block_k, scale, interpret,
         bwd_chunk):
    out = sparse_packed_attention(
        q, k, v, doc, fan, noi, block_q, block_k, scale, interpret, bwd_chunk
    )
    return out, (q, k, v, doc, fan, noi)


def _bwd(block_q, block_k, scale, interpret, bwd_chunk, res, g):
    """Backward by recompute through the chunked XLA path — the identical
    function, so gradients are exact; memory stays O(chunk * S)."""
    from bagel_tpu.ops.chunked import chunked_packed_attention

    q, k, v, doc, fan, noi = res
    s = q.shape[0]
    chunk = bwd_chunk if s % bwd_chunk == 0 else s  # chunk must divide S
    _, vjp = jax.vjp(
        lambda q_, k_, v_: chunked_packed_attention(
            q_, k_, v_, doc, fan, noi, chunk=chunk, scale=scale
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)

    def zero(x):  # int-dtype primals take float0 cotangents
        import numpy as np

        return np.zeros(x.shape, jax.dtypes.float0)

    return dq, dk, dv, zero(doc), zero(fan), zero(noi)


sparse_packed_attention.defvjp(_fwd, _bwd)
