"""Functional normalization ops.

Numerics match the reference exactly where it matters for the fidelity gate:
RMSNorm computes the variance in float32 and casts back to the input dtype
*before* the weight multiply (reference modeling/qwen2/modeling_qwen2.py:45-59).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis. fp32 accumulation, output in x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight * xf.astype(dtype)).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """LayerNorm over the last axis (fp32 statistics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * weight + bias).astype(dtype)


def group_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, num_groups: int = 32,
    eps: float = 1e-6,
) -> jax.Array:
    """GroupNorm for NHWC tensors (channels last — TPU conv layout).

    Matches torch.nn.GroupNorm semantics (reference autoencoder.py:43,75).
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * weight + bias).astype(dtype)
