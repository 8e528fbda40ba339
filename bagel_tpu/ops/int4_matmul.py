"""Pallas fused int4 dequant-matmul for bandwidth-bound (decode) shapes.

The int4 path through XLA (`dequantize_weight4` then `jnp.dot`) materializes
the unpacked bf16 weight in HBM — 2 bytes written + 2 read per element on
top of the 0.5-byte packed read, so int4 decode would be ~2.5x SLOWER than
int8 instead of 2x faster. This kernel streams the packed nibbles through
VMEM once and never materializes the dequantized matrix: per (out-tile,
k-group) step it loads one [group/2, bn] uint8 tile, splits the low/high
nibbles, and issues two small MXU dots against the even/odd activation
rows (packing puts input row 2j in the low nibble and 2j+1 in the high
nibble of packed row j — utils/quant._pack_nibbles), then scales the
partial sum by that k-group's per-column scale:

    out[m, n] = sum_g scale[g, n] * sum_{j in g} (lo[j,n]-8) x[m,2j]
                                              + (hi[j,n]-8) x[m,2j+1]

Weight bytes read = in*out/2 — the speed-of-light for 4-bit weights. The
m dimension (decode batch) pads to 8 sublanes; large-m callers (prefill,
train) stay on the XLA path where the matmul is compute-bound anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # input rows per scale group (utils/quant.quantize_weight_int4)
_BKP = GROUP // 2  # packed rows per k step
_BN = 512  # output columns per tile


def _int4_kernel(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_scr):
    kg = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kg == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    wp = wp_ref[...]  # [bkp, bn] uint8
    lo = (wp & jnp.uint8(15)).astype(jnp.int8) - 8
    hi = (wp >> jnp.uint8(4)).astype(jnp.int8) - 8
    xe = xe_ref[0]  # [bkp, m] (k-major so the block tiles legally)
    xo = xo_ref[0]
    # contract over the packed-row dim of both operands -> [m, bn]
    part = jax.lax.dot_general(
        xe, lo.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        xo, hi.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] += part * s_ref[0]  # [1, bn] broadcasts over m

    @pl.when(kg == nk - 1)
    def _finalize():
        o_ref[...] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(
    x: jax.Array,  # [M, in]
    w_p4: jax.Array,  # [in/2, out] packed nibbles
    scale4: jax.Array,  # [in/GROUP, out] f32
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant(w_p4, scale4) -> [M, out] bf16 without materializing the
    dequantized weight. in % 256 == 0 and out % 512 == 0 required (true for
    every BAGEL matmul)."""
    m, in_ = x.shape
    kp, out = w_p4.shape
    assert kp * 2 == in_ and in_ % (2 * _BKP) == 0 and out % _BN == 0, (
        x.shape, w_p4.shape)
    assert scale4.shape == (in_ // GROUP, out), scale4.shape
    mp = -(-m // 8) * 8
    xb = x.astype(jnp.bfloat16)
    if mp != m:
        xb = jnp.pad(xb, ((0, mp - m), (0, 0)))
    nk = in_ // (2 * _BKP)
    # even/odd input rows, k-major [nk, bkp, m]: TPU block tiling needs the
    # last two dims (8, 128)-divisible or equal to the array dims; a
    # (m, bkp) slice of [m, in/2] is neither, but a (1, bkp, m) slice of
    # [nk, bkp, m] is (the sparse_flash [n, 1, block] metadata trick).
    # Scales likewise become [nk, 1, out].
    xe = xb[:, 0::2].T.reshape(nk, _BKP, mp)
    xo = xb[:, 1::2].T.reshape(nk, _BKP, mp)
    s3 = scale4.astype(jnp.float32).reshape(nk, 1, out)

    grid = (out // _BN, nk)
    res = pl.pallas_call(
        _int4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BKP, mp), lambda no, kg: (kg, 0, 0)),
            pl.BlockSpec((1, _BKP, mp), lambda no, kg: (kg, 0, 0)),
            pl.BlockSpec((_BKP, _BN), lambda no, kg: (kg, no)),
            pl.BlockSpec((1, 1, _BN), lambda no, kg: (kg, 0, no)),
        ],
        out_specs=pl.BlockSpec((mp, _BN), lambda no, kg: (0, no)),
        scratch_shapes=[pltpu.VMEM((mp, _BN), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mp, out), jnp.bfloat16),
        interpret=interpret,
    )(xe, xo, w_p4, s3)
    return res[:m]


def int4_gemv_eligible(x_rows: int, leaf: dict) -> bool:
    """Kernel beats the XLA dequant path only when the matmul is
    weight-bandwidth-bound (few activation rows) and shapes tile."""
    if "w_p4" not in leaf or jax.default_backend() != "tpu":
        return False
    kp, out = leaf["w_p4"].shape
    in_ = kp * 2
    return (
        x_rows <= 64
        and in_ % (2 * _BKP) == 0
        and out % _BN == 0
        and leaf["scale4"].shape[0] == in_ // GROUP
    )
