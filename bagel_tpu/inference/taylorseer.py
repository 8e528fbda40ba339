"""TaylorSeer step cache for the denoise loop, TPU-native.

The reference (modeling/cache_utils/taylorseer.py + hooks in
qwen2_navit.py:773-829) runs a "full" transformer forward every
fresh_threshold-th step and Taylor-extrapolates per-layer features in
between. Observation: in Taylor steps every layer's output is replaced by
its own extrapolation, so intermediate-layer extrapolations never influence
the result — only the final feature matters. We therefore cache Taylor
factors of the per-branch *velocity field* v_t = llm2vae(norm(h_last))
directly ([B, N, 64] instead of 28 x [N+2, 3584]): mathematically the same
skip structure, 50x smaller state, and the whole schedule is static so the
jitted scan uses lax.cond to skip the LLM on Taylor steps.

Schedule parity with cal_type (taylorseer.py:79-114, defaults
fresh_threshold=3, first_enhance=5, taylor_cache=True): the first
`first_enhance` steps are full; afterwards every 3rd step is full.
Derivative stacking parity with derivative_approximation (:11-29): factor
order grows by one per full step once step > first_enhance - 2, capped at
max_order.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class TaylorSchedule(NamedTuple):
    is_full: np.ndarray  # [K] bool
    x_off: np.ndarray  # [K] float: step - last_full_step (Taylor steps)
    delta: np.ndarray  # [K] float: distance between the last two full steps
    grow: np.ndarray  # [K] bool: whether factor order may grow this step


def taylorseer_schedule(
    num_steps: int, fresh_threshold: int = 3, first_enhance: int = 5
) -> TaylorSchedule:
    is_full = np.zeros(num_steps, bool)
    x_off = np.zeros(num_steps, np.float32)
    delta = np.ones(num_steps, np.float32)
    grow = np.zeros(num_steps, bool)
    counter = 0
    last_full = 0
    prev_full = 0
    for k in range(num_steps):
        first = k < first_enhance
        if first or counter == fresh_threshold - 1:
            is_full[k] = True
            counter = 0
            prev_full, last_full = last_full, k
            delta[k] = max(1.0, last_full - prev_full)
            grow[k] = k > first_enhance - 2
        else:
            counter += 1
            x_off[k] = k - last_full
    return TaylorSchedule(is_full, x_off, delta, grow)


def _bmask(cond: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a scalar or per-branch [B] bool against factors[0]'s shape
    [B, ...] (or any shape for scalar cond)."""
    if cond.ndim == 0:
        return cond
    return cond.reshape(cond.shape + (1,) * (like.ndim - cond.ndim))


def taylor_update(
    factors: jax.Array,  # [O+1, ...] stacked derivative factors
    n_valid: jax.Array,  # [] or [B] int32: number of valid factors
    feature: jax.Array,  # new observation (same shape as factors[0])
    delta: jax.Array,  # [] float: step distance since previous full step
    grow: jax.Array,  # [] bool
) -> Tuple[jax.Array, jax.Array]:
    """Finite-difference derivative stack (derivative_approximation parity).

    n_valid may be per-branch [B] when factors are [O+1, B, ...]: branches
    that joined the run later (CFG branches entering mid-schedule) grow their
    own order counts independently, matching the reference's three separate
    cache dicts (bagel.py:680-689)."""
    max_order = factors.shape[0] - 1
    new = [feature]
    for i in range(max_order):
        fd = (new[i] - factors[i]) / delta
        valid = _bmask(grow & (i < n_valid), fd)
        new.append(jnp.where(valid, fd, jnp.zeros_like(fd)))
    stacked = jnp.stack(new, 0)
    new_n = jnp.where(grow, jnp.minimum(n_valid + 1, max_order + 1),
                      jnp.ones_like(n_valid))
    return stacked, new_n


def taylor_eval(
    factors: jax.Array, n_valid: jax.Array, x: jax.Array
) -> jax.Array:
    """sum_i factors[i] * x^i / i! over valid factors (taylor_formula)."""
    max_order = factors.shape[0] - 1
    out = jnp.zeros_like(factors[0])
    for i in range(max_order + 1):
        coeff = (x**i) / math.factorial(i)
        term = factors[i] * coeff
        out = out + jnp.where(_bmask(i < n_valid, term), term,
                              jnp.zeros_like(term))
    return out
