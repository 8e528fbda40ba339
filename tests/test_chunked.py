"""Chunked packed attention vs dense mask path (values + gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.ops.attention import dot_attention, train_packed_mask
from bagel_tpu.ops.chunked import chunked_packed_attention


def _meta(rng, s):
    doc = np.repeat([1, 2], s // 2).astype(np.int32)
    fan = np.full(s, -1, np.int32)
    fan[s // 4 : s // 2] = 1  # full split in doc 1
    noi = np.full(s, -1, np.int32)
    noi[3 * s // 4 :] = 5  # noise split in doc 2
    fan[3 * s // 4 :] = 5
    return jnp.asarray(doc), jnp.asarray(fan), jnp.asarray(noi)


@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_chunked_matches_dense(chunk):
    rng = np.random.default_rng(0)
    S, H, KH, D = 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, KH, D)), jnp.float32)
    doc, fan, noi = _meta(rng, S)

    mask = train_packed_mask(doc, fan, noi)
    expected = dot_attention(q[None], k[None], v[None], mask=mask[None],
                             precision="float32")[0]
    got = chunked_packed_attention(q, k, v, doc, fan, noi, chunk=chunk,
                                   precision="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_chunked_gradients_match_dense():
    rng = np.random.default_rng(1)
    S, H, KH, D = 32, 2, 1, 8
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, KH, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((S, KH, D)), jnp.float32)
    doc, fan, noi = _meta(rng, S)
    mask = train_packed_mask(doc, fan, noi)

    def loss_dense(q, k, v):
        o = dot_attention(q[None], k[None], v[None], mask=mask[None],
                          precision="float32")[0]
        return jnp.sum(o**2)

    def loss_chunked(q, k, v):
        o = chunked_packed_attention(q, k, v, doc, fan, noi, chunk=8,
                                     precision="float32")
        return jnp.sum(o**2)

    g1 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    from asserts import assert_grad_trees_close
    assert_grad_trees_close(g2, g1, rtol=5e-5, atol=5e-5)


def test_train_forward_with_chunked_matches_dense():
    from bagel_tpu.configs import micro_bagel
    from bagel_tpu.data.packing import make_synthetic_batch
    from bagel_tpu.models.bagel import bagel_forward_train, init_bagel_params

    cfg = micro_bagel()
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(cfg, rng, seq_len=64, n_text=8,
                                 vit_hw=(28, 28), vae_hw=(16, 16))
    noise = jnp.zeros((batch.vae_patches.shape[0], cfg.patch_latent_dim))

    dense = bagel_forward_train(params, cfg, batch, noise, precision="float32")
    chunked = bagel_forward_train(params, cfg, batch, noise,
                                  precision="float32", attn_chunk=16)
    from asserts import assert_close_live
    assert_close_live(chunked["ce"], dense["ce"], floor=1e-5,
                      rtol=1e-4, atol=1e-4, name="ce")
    assert_close_live(chunked["mse"], dense["mse"], floor=1e-5,
                      rtol=1e-4, atol=1e-4, name="mse")
