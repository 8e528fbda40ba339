"""Positional / timestep embedding tables.

Frozen 2-D sin-cos grid table (reference modeling/bagel/modeling_utils.py:24-66,
127-144) and DiT-style sinusoidal timestep embedding (:87-105).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sincos_1d(embed_dim: int, pos: jax.Array) -> jax.Array:
    """[M] positions -> [M, embed_dim] with layout [sin | cos].

    Matches get_1d_sincos_pos_embed_from_grid (modeling_utils.py:48-66).
    """
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / (10000.0**omega)
    out = pos.reshape(-1).astype(omega.dtype)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1).astype(jnp.float32)


def sincos_2d_grid(embed_dim: int, grid_size: int) -> jax.Array:
    """[grid_size**2, embed_dim] frozen table; row-major over (h, w).

    First half of channels encodes the row coordinate, second half the column
    (modeling_utils.py:37-45; note grid[0]=w-meshgrid-first means emb_h is fed
    the *h* steps of meshgrid(w, h)[0]... we replicate the exact reference
    layout: np.meshgrid(w, h) -> grid[0][i, j] = w_j, grid[1][i, j] = h_i, and
    emb = [sincos(grid[0]) | sincos(grid[1])] = [cols | rows]).
    """
    coords = jnp.arange(grid_size, dtype=jnp.float32)
    # np.meshgrid(grid_w, grid_h): grid[0][i,j]=w_j, grid[1][i,j]=h_i
    grid_w = jnp.tile(coords[None, :], (grid_size, 1))  # [H, W] of col ids
    grid_h = jnp.tile(coords[:, None], (1, grid_size))  # [H, W] of row ids
    emb_w = sincos_1d(embed_dim // 2, grid_w.reshape(-1))
    emb_h = sincos_1d(embed_dim // 2, grid_h.reshape(-1))
    return jnp.concatenate([emb_w, emb_h], axis=1)


def timestep_embedding(
    t: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """[N] (fractional) timesteps -> [N, dim], layout [cos | sin].

    Matches TimestepEmbedder.timestep_embedding (modeling_utils.py:87-105).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(0, half, dtype=jnp.float32)
        / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def flattened_position_ids_extrapolate(
    img_h: int, img_w: int, patch_size: int, max_num_patches_per_side: int
) -> "np.ndarray":
    """Grid positions flattened into a max_side**2 table (data_utils.py:53-58).

    Host-side helper: pure numpy so data-pipeline worker processes never
    touch a JAX backend.
    """
    import numpy as np

    num_h, num_w = img_h // patch_size, img_w // patch_size
    coords_h = np.arange(num_h, dtype=np.int32)
    coords_w = np.arange(num_w, dtype=np.int32)
    return (coords_h[:, None] * max_num_patches_per_side + coords_w).reshape(-1)


def flattened_position_ids_interpolate(
    img_h: int, img_w: int, patch_size: int, max_num_patches_per_side: int
) -> "np.ndarray":
    """Bucketized fractional positions (data_utils.py:61-69). Pure numpy."""
    import numpy as np

    num_h, num_w = img_h // patch_size, img_w // patch_size
    boundaries = np.arange(
        1 / max_num_patches_per_side, 1.0, 1 / max_num_patches_per_side
    )
    frac_h = np.arange(0, 1 - 1e-6, 1 / num_h)
    frac_w = np.arange(0, 1 - 1e-6, 1 / num_w)
    bucket_h = np.searchsorted(boundaries, frac_h, side="right")
    bucket_w = np.searchsorted(boundaries, frac_w, side="right")
    return (
        bucket_h[:, None] * max_num_patches_per_side + bucket_w
    ).reshape(-1).astype(np.int32)
