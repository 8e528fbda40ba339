"""Expert parallelism (MoT und/gen experts sharded 2-way) vs dense select.

The expert-parallel forward (parallel/expert.py) must reproduce the exact
math of the dense dual-expert + select formulation: each device computes
only its expert's matmuls and the masked psum performs the modality
routing, so losses AND parameter gradients must match — including the
freeze_und stop-gradient pattern and the moe (shared-attention) variant.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from bagel_tpu.configs import micro_bagel
from bagel_tpu.data.packing import make_synthetic_batch, stack_batches
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.train.step import compute_losses


def _setup(B=1, seed=0, layers=3, **llm_kw):
    cfg = micro_bagel()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(
            cfg.llm, num_hidden_layers=layers, **llm_kw
        )
    )
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["llm2vae"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), params["llm2vae"]["w"].shape, jnp.float32
    )
    # decouple the gen expert from its und-copy init so routing mistakes
    # cannot cancel out
    if "attn_gen" in params["llm"]["layers"]:
        params["llm"]["layers"]["attn_gen"] = jax.tree.map(
            lambda a: a + 0.01 * jax.random.normal(
                jax.random.PRNGKey(11), a.shape, a.dtype
            ) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params["llm"]["layers"]["attn_gen"],
        )
    params["llm"]["layers"]["mlp_gen"] = jax.tree.map(
        lambda a: a + 0.01 * jax.random.normal(
            jax.random.PRNGKey(13), a.shape, a.dtype
        ),
        params["llm"]["layers"]["mlp_gen"],
    )
    rng = np.random.default_rng(seed)
    batch = stack_batches(
        [make_synthetic_batch(cfg, rng, seq_len=128) for _ in range(B)]
    )
    noise = jax.random.normal(
        jax.random.PRNGKey(2), batch.vae_patches.shape, jnp.float32
    )
    return cfg, params, batch, noise


def _compare(cfg, params, batch, noise, mesh, **kw):
    def loss_fn(p, ep_):
        return compute_losses(
            p, cfg, batch, noise, ce_weight=1.0, mse_weight=1.0,
            precision="float32", expert_parallel=ep_, **kw,
        )[0]

    l_dense, g_dense = jax.value_and_grad(lambda p: loss_fn(p, None))(params)
    with mesh:
        l_ep, g_ep = jax.jit(
            jax.value_and_grad(lambda p: loss_fn(p, (mesh, "ep")))
        )(params)
    from asserts import assert_close_live, assert_grad_trees_close
    assert_close_live(float(l_ep), float(l_dense), floor=1e-5, rtol=1e-5,
                      name="ep loss")
    assert_grad_trees_close(g_ep, g_dense, rtol=3e-4, atol=1e-5,
                            name="ep grads")


@pytest.mark.parametrize("freeze", [False, True])
def test_expert_parallel_mot_gradients_match_dense(freeze):
    cfg, params, batch, noise = _setup(freeze_und=freeze)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("ep",))
    _compare(cfg, params, batch, noise, mesh)


def test_expert_parallel_moe_variant():
    """moe layer variant: shared attention, expert-parallel FFN only."""
    cfg, params, batch, noise = _setup(layer_module="moe", seed=3)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("ep",))
    _compare(cfg, params, batch, noise, mesh)


def test_expert_parallel_batched_and_chunked():
    """ep composes with vmap over batch rows and with chunked attention
    (no dense [S, S] mask — the long-sequence configuration)."""
    cfg, params, batch, noise = _setup(B=2, seed=5)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("ep",))
    _compare(cfg, params, batch, noise, mesh, attn_chunk=64)
