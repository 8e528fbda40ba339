"""Pallas w8a8 matmul: hand-tiled int8 MXU GEMM for the denoise shapes.

Motivation (NOTES round-4 roofline): XLA's int8 dot_general delivers only
82 TOPS at the qkv/o shapes (M=4608, K=N=3584) vs 221 TOPS at K=N=8192 —
a narrow-reduction tiling artifact that also hits bf16. This kernel owns
the tiling explicitly: grid (m, n, k) with an int32 VMEM accumulator and
the w8a8 epilogue (per-token activation scale x per-column weight scale,
models/qwen2.py `_linear` 'w_q8' semantics) fused into the last k step.

Replaces the XLA lowering of: reference qwen2_navit.py dense layers under
W8A8 quantization (our utils/quant.py mode="w8a8"); numerics are exactly
the XLA path's (same int32 accumulation, same fp32 epilogue ordering).

Tile choice (swept on chip, scripts/sweep_int8_pallas.py):
the full-K single-step variant (bk = K) with bm=1536/bn=512 wins at every
denoise shape — 2.5x XLA at K=N=3584, parity at the wide mlp shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xq_ref, xs_ref, w_ref, ws_ref, o_ref, acc_ref):
    nk = pl.num_programs(2)
    kg = pl.program_id(2)

    @pl.when(kg == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(kg == nk - 1)
    def _epilogue():
        o_ref[...] = (
            acc_ref[:].astype(jnp.float32) * xs_ref[...] * ws_ref[...]
        ).astype(o_ref.dtype)


def _kernel_onek(xq_ref, xs_ref, w_ref, ws_ref, o_ref):
    """bk == K: no accumulator round-trips, epilogue fused in the dot's
    consumer — the fastest variant at denoise shapes."""
    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        acc.astype(jnp.float32) * xs_ref[...] * ws_ref[...]
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype", "interpret")
)
def int8_matmul(
    xq: jax.Array,  # [M, K] int8
    xs: jax.Array,  # [M, 1] f32 per-token activation scales
    wq: jax.Array,  # [K, N] int8
    ws: jax.Array,  # [N] f32 per-column weight scales
    *,
    bm: int = 1536,
    bn: int = 512,
    bk: int = 0,  # 0 = full K in one step
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """(xq @ wq).f32 * xs * ws -> [M, N] out_dtype. M % bm == K % bk ==
    N % bn == 0 required (callers pad M; K/N are model dims)."""
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2 and xs.shape == (m, 1) and ws.shape == (n,), (
        xq.shape, xs.shape, wq.shape, ws.shape)
    bm, bn = min(bm, m), min(bn, n)
    bk = k if bk in (0, k) else bk
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (m, n, k, bm, bn, bk)
    ws2 = ws.reshape(1, n)
    if bk == k:
        return pl.pallas_call(
            _kernel_onek,
            grid=(m // bm, n // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((k, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * n * k,
                bytes_accessed=m * k + k * n + 2 * m * n,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xq, xs, wq, ws2)
    return pl.pallas_call(
        _kernel,
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kg: (i, kg)),
            pl.BlockSpec((bm, 1), lambda i, j, kg: (i, 0)),
            pl.BlockSpec((bk, bn), lambda i, j, kg: (kg, j)),
            pl.BlockSpec((1, bn), lambda i, j, kg: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kg: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + 2 * m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xs, wq, ws2)
