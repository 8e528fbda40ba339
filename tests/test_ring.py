"""Ring attention (context parallel) vs single-device reference."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from bagel_tpu.ops.attention import dot_attention
from bagel_tpu.ops.ring import ring_attention


def _mesh(sp):
    devs = np.asarray(jax.devices()[:sp])
    return Mesh(devs, ("sp",))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sp", [2, 4])
def test_ring_matches_dense(causal, sp):
    rng = np.random.default_rng(0)
    B, S, H, KH, D = 2, 32, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KH, D)), jnp.float32)

    if causal:
        i = jnp.arange(S)
        mask = (i[:, None] >= i[None, :])[None]
    else:
        mask = None
    expected = dot_attention(q, k, v, mask=mask, precision="float32")

    mesh = _mesh(sp)
    fn = shard_map(
        partial(ring_attention, axis_name="sp", causal=causal),
        mesh,
        in_specs=(P(None, "sp", None, None),) * 3,
        out_specs=P(None, "sp", None, None),
    )
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )
