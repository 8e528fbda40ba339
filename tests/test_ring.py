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
    from asserts import assert_close_live
    assert_close_live(got, expected, floor=1e-3, rtol=2e-5, atol=2e-5,
                      name="ring attention")


def test_ring_packed_attention_matches_dense_mask():
    """ring_packed_attention under the train mask == dot_attention with
    train_packed_mask, on a 4-way CPU ring."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from bagel_tpu.ops.attention import dot_attention, train_packed_mask
    from bagel_tpu.ops.ring import ring_packed_attention

    s, h, kh, d = 32, 4, 2, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, s, kh, d)), jnp.float32)
    doc = jnp.asarray([1] * 12 + [2] * 14 + [0] * 6, jnp.int32)
    fan = jnp.asarray([-1] * 4 + [0] * 8 + [-1] * 6 + [1] * 8 + [-1] * 6,
                      jnp.int32)
    noi = jnp.asarray([-1] * 4 + [0] * 8 + [-1] * 20, jnp.int32)

    mask = train_packed_mask(doc, fan, noi)
    want = dot_attention(q, k, v, mask=mask[None], precision="float32")

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    got = jax.jit(
        jax.shard_map(
            partial(ring_packed_attention, axis_name="sp"),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                      P("sp"), P("sp"), P("sp")),
            out_specs=P(None, "sp"),
            check_vma=False,
        )
    )(q, k, v, doc, fan, noi)
    from asserts import assert_close_live
    assert_close_live(got, want, floor=1e-3, rtol=2e-4, atol=2e-4,
                      name="ring packed attention")


def test_context_parallel_train_gradients_match_dense():
    """compute_losses with context_parallel == the dense-mask path: loss and
    parameter gradients agree on a CPU mesh (VERDICT r1 next-step #9)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bagel_tpu.configs import micro_bagel
    from bagel_tpu.data.packing import make_synthetic_batch, stack_batches
    from bagel_tpu.models.bagel import init_bagel_params
    from bagel_tpu.parallel import make_mesh
    from bagel_tpu.train.step import compute_losses

    cfg = micro_bagel()
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["llm2vae"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), params["llm2vae"]["w"].shape, jnp.float32
    )
    batch = stack_batches([
        make_synthetic_batch(cfg, np.random.default_rng(0), seq_len=256)
    ])
    noise = jax.random.normal(
        jax.random.PRNGKey(2), batch.vae_patches.shape, jnp.float32
    )
    mesh = make_mesh((1, 4, 1), devices=jax.devices()[:4])

    def loss_fn(p, cp):
        return compute_losses(p, cfg, batch, noise, ce_weight=1.0,
                              mse_weight=1.0, precision="float32",
                              context_parallel=cp)[0]

    with mesh:
        l_dense, g_dense = jax.value_and_grad(lambda p: loss_fn(p, None))(params)
        l_cp, g_cp = jax.value_and_grad(
            lambda p: loss_fn(p, (mesh, "fsdp"))
        )(params)
    from asserts import assert_close_live, assert_grad_trees_close
    assert_close_live(float(l_cp), float(l_dense), floor=1e-5, rtol=1e-4,
                      name="cp loss")
    assert_grad_trees_close(g_cp, g_dense, rtol=3e-3, atol=3e-4,
                            name="cp grads")
