"""Rotary position embeddings.

1-D RoPE for the LLM (reference modeling/qwen2/modeling_qwen2.py:66-186) and
2-D axial RoPE for the SigLIP NaViT tower (siglip_navit.py:102-142).

Conventions:
- cos/sin tables are computed in float32 from integer position ids.
- `rotate_half` layout: [-x2, x1] with the split at head_dim//2 (HF style),
  NOT interleaved pairs.
- LLM q/k layout here is [..., seq, heads, head_dim]; cos/sin broadcast over
  the heads axis.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def rope_inv_freq(dim: int, theta: float) -> jax.Array:
    """inv_freq[i] = theta^(-2i/dim), i in [0, dim/2)."""
    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    return 1.0 / (theta**exponents)


def rope_cos_sin(
    position_ids: jax.Array, dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin of shape position_ids.shape + (dim,), float32.

    freqs are duplicated [f, f] along the last axis (HF convention,
    modeling_qwen2.py:141-144).
    """
    inv_freq = rope_inv_freq(dim, theta)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary embedding to q [..., S, H, D] and k [..., S, KH, D].

    cos/sin are [..., S, D] and broadcast over the heads axis. Rotation is
    done in float32 and cast back to the input dtype (matches the
    reference's fp32-QK-norm-then-rope behaviour in the gen path,
    qwen2_navit.py:542-557).
    """
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        return ((xf * cos) + (rotate_half(xf) * sin)).astype(x.dtype)

    return rot(q), rot(k)


@partial(jax.jit, static_argnames=("dim", "theta"))
def apply_rope_at_positions(q, k, position_ids, *, dim: int, theta: float):
    cos, sin = rope_cos_sin(position_ids, dim, theta)
    return apply_rope(q, k, cos, sin)


# ---------------------------------------------------------------------------
# 2-D axial RoPE for the ViT (siglip_navit.py:102-142)
# ---------------------------------------------------------------------------


def rope_2d_tables(
    dim_half: int, max_h: int, max_w: int, theta: float = 10000.0
):
    """Precompute (cos_h, sin_h, cos_w, sin_w), each [max_h*max_w, dim_half].

    `dim_half` is head_dim//2: the first half of each head rotates by the row
    coordinate, the second half by the column coordinate.
    Row-major flattening: table[r * max_w + c].
    """
    inv_freq = rope_inv_freq(dim_half, theta)  # [dim_half/2]
    rows = jnp.arange(max_h, dtype=jnp.float32)[:, None] * jnp.ones((1, max_w))
    cols = jnp.ones((max_h, 1)) * jnp.arange(max_w, dtype=jnp.float32)[None, :]

    def one_side(grid):
        freqs = grid[..., None] * inv_freq  # [H, W, dim_half/2]
        emb = jnp.concatenate([freqs, freqs], axis=-1).reshape(-1, dim_half)
        return jnp.cos(emb), jnp.sin(emb)

    cos_h, sin_h = one_side(rows)
    cos_w, sin_w = one_side(cols)
    return cos_h, sin_h, cos_w, sin_w


def apply_rope_2d(q, k, cos_h, sin_h, cos_w, sin_w):
    """2-D axial rope on q/k of shape [S, H, D].

    cos_h etc. are [S, D/2] gathered at each token's flattened grid position.
    First D/2 channels rotate with the row tables, last D/2 with the column
    tables (siglip_navit.py:224-230).
    """
    half = q.shape[-1] // 2

    def rot(x, cos, sin):
        xf = x.astype(jnp.float32)
        out = xf * cos[:, None, :] + rotate_half(xf) * sin[:, None, :]
        return out

    qh = rot(q[..., :half], cos_h, sin_h)
    qw = rot(q[..., half:], cos_w, sin_w)
    kh = rot(k[..., :half], cos_h, sin_h)
    kw = rot(k[..., half:], cos_w, sin_w)
    q_out = jnp.concatenate([qh, qw], axis=-1).astype(q.dtype)
    k_out = jnp.concatenate([kh, kw], axis=-1).astype(k.dtype)
    return q_out, k_out
