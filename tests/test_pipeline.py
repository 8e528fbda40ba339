"""Pipeline parallelism (GPipe over the MoT layer stack) vs vmapped dense.

The pipelined forward (parallel/pipeline.py) must reproduce the exact math
of vmapping bagel_forward_train over the batch rows: same losses, same
parameter gradients (through ppermute and the GPipe bubble schedule).
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


def _cfg(layers=4):
    cfg = micro_bagel()
    return dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_hidden_layers=layers)
    )


def _setup(B, seed=0):
    cfg = _cfg(4)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["llm2vae"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(7), params["llm2vae"]["w"].shape, jnp.float32
    )
    rng = np.random.default_rng(seed)
    batch = stack_batches(
        [make_synthetic_batch(cfg, rng, seq_len=128) for _ in range(B)]
    )
    noise = jax.random.normal(
        jax.random.PRNGKey(2), batch.vae_patches.shape, jnp.float32
    )
    return cfg, params, batch, noise


@pytest.mark.parametrize("pp,B", [(2, 3), (4, 2)])
def test_pipeline_train_gradients_match_dense(pp, B):
    cfg, params, batch, noise = _setup(B)
    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))

    def loss_fn(p, pl_):
        return compute_losses(
            p, cfg, batch, noise, ce_weight=1.0, mse_weight=1.0,
            precision="float32", pipeline_parallel=pl_,
        )[0]

    l_dense, g_dense = jax.value_and_grad(lambda p: loss_fn(p, None))(params)
    with mesh:
        l_pp, g_pp = jax.jit(
            jax.value_and_grad(lambda p: loss_fn(p, (mesh, "pp")))
        )(params)
    from asserts import assert_close_live, assert_grad_trees_close
    assert_close_live(float(l_pp), float(l_dense), floor=1e-5, rtol=1e-5,
                      name="pp loss")
    assert_grad_trees_close(g_pp, g_dense, rtol=3e-4, atol=1e-5,
                            name="pp grads")


def test_pipeline_chunked_attention_matches_dense():
    """Pipeline + chunked attention (no dense [S, S] mask — the long-seq
    configuration) still matches the dense-mask path."""
    cfg, params, batch, noise = _setup(B=2, seed=1)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))

    def loss_fn(p, pl_, chunk):
        return compute_losses(
            p, cfg, batch, noise, ce_weight=1.0, mse_weight=1.0,
            precision="float32", pipeline_parallel=pl_, attn_chunk=chunk,
        )[0]

    l_dense = float(loss_fn(params, None, None))
    with mesh:
        l_pp = float(
            jax.jit(lambda p: loss_fn(p, (mesh, "pp"), 64))(params)
        )
    from asserts import assert_close_live
    assert_close_live(l_pp, l_dense, floor=1e-5, rtol=1e-5,
                      name="pp chunked loss")
