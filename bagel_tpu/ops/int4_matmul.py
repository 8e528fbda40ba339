"""Pallas fused int4 dequant-matmul for bandwidth-bound (decode) shapes.

The int4 path through XLA (`dequantize_weight4` then `jnp.dot`) materializes
the unpacked bf16 weight in HBM — 2 bytes written + 2 read per element on
top of the 0.5-byte packed read, so int4 decode would be ~2.5x SLOWER than
int8 instead of 2x faster. This kernel streams the packed nibbles through
VMEM once and never materializes the dequantized matrix in HBM. Per
(out-tile, k-tile) grid step it:

1. loads a [kt, bkp, bn] uint8 tile (kt scale groups of bkp packed rows),
2. splits low/high nibbles and folds each group's per-column scale into
   the unpacked bf16 weights on the VPU (broadcast over the group dim),
3. flattens (kt, bkp) -> kt*bkp and contracts the even/odd activation rows
   in TWO large MXU dots (K = kt*bkp) — packing puts input row 2j in the
   low nibble and 2j+1 in the high nibble of packed row j
   (utils/quant._pack_nibbles):

    out[m, n] = sum_g sum_{j in g} x[m,2j]   * scale[g,n] * (lo[g,j,n]-8)
                                 + x[m,2j+1] * scale[g,n] * (hi[g,j,n]-8)

Weight bytes read = in*out/2 — the speed-of-light for 4-bit weights. The
m dimension (decode batch) pads to 8 sublanes; large-m callers (prefill,
train) stay on the XLA path where the matmul is compute-bound anyway.

Performance history (measured on chip): a fine grid of per-group [64, bn]
tiles ran 3.6x SLOWER than int8 decode (grid/DMA overhead per tiny tile);
one dot per scale group with coarse DMA still spent ~1 us of fixed
tpu.matmul overhead x 56 dots per call (563 us for a 6.4 MB read). The
scale-fold + flatten formulation is what makes the dot count independent
of the scale-group count.

Mosaic notes (v5e libtpu, learned on hardware):
- NO 8-bit vector arithmetic legalizes (arith.subi / shrui on
  vector<..xi8>): widen the packed bytes to i32 before any nibble math.
- tpu.matmul rejects multi-dim contractions ("lhs contracting dims must
  be of size 1") — hence the explicit flatten before the dot.
- block tiling: the last two dims of every BlockSpec must be
  (8, 128)-divisible or equal to the array dims — hence the k-major
  [nk, bkp, m] activation layout (m == full dim) and the [nk, bkp, out]
  weight layout (bkp % 8 == 0, bn % 128 == 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # input rows per scale group (utils/quant.quantize_weight_int4)
_BKP = GROUP // 2  # packed rows per scale group
_BN = 512  # output columns per tile
_KT_MAX = 64  # max scale groups per k step (~5*kt*bkp*bn bytes of VMEM)


def _int4_kernel(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_scr):
    kg = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kg == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    w32 = wp_ref[...].astype(jnp.int32)  # [kt, bkp, bn]
    s = s_ref[...]  # [kt, 1, bn] f32, broadcasts over the group rows
    lo = (((w32 & 15) - 8).astype(jnp.float32) * s).astype(jnp.bfloat16)
    hi = (((w32 >> 4) - 8).astype(jnp.float32) * s).astype(jnp.bfloat16)
    kt, bkp, bn = lo.shape
    xe = xe_ref[...]  # [kt, bkp, m]
    xo = xo_ref[...]
    m = xe.shape[-1]
    # flatten the (group, packed-row) dims: one big single-contraction dot
    # per nibble instead of one per scale group
    dims = (((0,), (0,)), ((), ()))
    acc_scr[:] += jax.lax.dot_general(
        xe.reshape(kt * bkp, m), lo.reshape(kt * bkp, bn), dims,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        xo.reshape(kt * bkp, m), hi.reshape(kt * bkp, bn), dims,
        preferred_element_type=jnp.float32,
    )

    @pl.when(kg == nk - 1)
    def _finalize():
        o_ref[...] = acc_scr[:].astype(o_ref.dtype)


def _prep_weights(w_p4, scale4):
    """[kp, out] packed + [nk, out] scales -> kernel layouts [nk, bkp, out]
    / [nk, 1, out] (zero-padded so _KT_MAX-capped k-tiles always divide)."""
    kp, out = w_p4.shape
    nk = kp // _BKP
    kt = min(nk, _KT_MAX)
    nkp = -(-nk // kt) * kt
    w3 = w_p4.reshape(nk, _BKP, out)
    s3 = scale4.astype(jnp.float32).reshape(nk, 1, out)
    if nkp != nk:
        pad = ((0, nkp - nk), (0, 0), (0, 0))
        w3, s3 = jnp.pad(w3, pad), jnp.pad(s3, pad)
    return w3, s3


def _prep_activations(x, nkp):
    """[M, in] -> even/odd k-major [nkp, bkp, mp] (m padded to 8 sublanes,
    k-groups zero-padded to match _prep_weights)."""
    m, in_ = x.shape
    nk = in_ // (2 * _BKP)
    mp = -(-m // 8) * 8
    xb = x.astype(jnp.bfloat16)
    if mp != m:
        xb = jnp.pad(xb, ((0, mp - m), (0, 0)))
    xe = xb[:, 0::2].T.reshape(nk, _BKP, mp)
    xo = xb[:, 1::2].T.reshape(nk, _BKP, mp)
    if nkp != nk:
        pad = ((0, nkp - nk), (0, 0), (0, 0))
        xe, xo = jnp.pad(xe, pad), jnp.pad(xo, pad)
    return xe, xo


def _int4_call(xe, xo, w3, s3, interpret=False):
    nkp, _, mp = xe.shape
    out = w3.shape[-1]
    kt = min(nkp, _KT_MAX)
    grid = (out // _BN, nkp // kt)
    return pl.pallas_call(
        _int4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kt, _BKP, mp), lambda no, kg: (kg, 0, 0)),
            pl.BlockSpec((kt, _BKP, mp), lambda no, kg: (kg, 0, 0)),
            pl.BlockSpec((kt, _BKP, _BN), lambda no, kg: (kg, 0, no)),
            pl.BlockSpec((kt, 1, _BN), lambda no, kg: (kg, 0, no)),
        ],
        out_specs=pl.BlockSpec((mp, _BN), lambda no, kg: (0, no)),
        scratch_shapes=[pltpu.VMEM((mp, _BN), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mp, out), jnp.bfloat16),
        interpret=interpret,
    )(xe, xo, w3, s3)


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
    w3, s3 = _prep_weights(w_p4, scale4)
    xe, xo = _prep_activations(x, w3.shape[0])
    res = _int4_call(xe, xo, w3, s3, interpret)
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
