"""Block-sparse train attention vs the dense-mask XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.ops.attention import dot_attention, train_packed_mask
from bagel_tpu.ops.sparse_flash import block_liveness, sparse_packed_attention


def _meta(s, rng, n_docs=3, pad=6):
    """Random packed metadata: n_docs docs, each with a causal text split, a
    full (vit) split and a noise (vae) split; trailing padding."""
    doc = np.zeros(s, np.int32)
    fan = np.full(s, -1, np.int32)
    noi = np.full(s, -1, np.int32)
    body = s - pad
    bounds = np.sort(rng.choice(np.arange(1, body), n_docs - 1, replace=False))
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [body]])
    sid = 0
    for d, (a, b) in enumerate(zip(starts, ends), start=1):
        doc[a:b] = d
        seg = np.array_split(np.arange(a, b), 3)
        # seg[0] causal text; seg[1] full; seg[2] noise
        if len(seg[1]):
            fan[seg[1]] = sid
            sid += 1
        if len(seg[2]):
            fan[seg[2]] = sid
            noi[seg[2]] = sid
            sid += 1
    return jnp.asarray(doc), jnp.asarray(fan), jnp.asarray(noi)


@pytest.mark.parametrize("seed", [0, 1])
def test_sparse_matches_dense(seed):
    s, h, kh, d = 128, 4, 2, 16
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((s, kh, d)), jnp.float32)
    doc, fan, noi = _meta(s, rng)

    mask = train_packed_mask(doc, fan, noi)
    want = dot_attention(
        q[None], k[None], v[None], mask=mask[None], precision="float32"
    )[0]
    got = sparse_packed_attention(
        q, k, v, doc, fan, noi, block_q=16, block_k=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_liveness_skips_cross_document_blocks():
    s = 128
    doc = jnp.asarray([1] * 32 + [2] * 64 + [0] * 32, jnp.int32)
    fan = jnp.full((s,), -1, jnp.int32)
    live_idx, live_cnt = block_liveness(doc, fan, block_q=16, block_k=16)
    # q block 0 (doc 1) must not visit kv blocks of doc 2 or padding
    assert int(live_cnt[0]) == 1 and int(live_idx[0, 0]) == 0
    # q block 5 (doc 2, rows 80:96) sees doc-2 blocks 2..5 only (causal)
    assert int(live_cnt[5]) == 4
    assert sorted(np.asarray(live_idx[5, :4]).tolist()) == [2, 3, 4, 5]
    # padded q rows have no live blocks
    assert int(live_cnt[7]) == 0
    total = int(live_cnt.sum())
    assert total < (s // 16) ** 2 // 2  # most tiles skipped


def test_sparse_gradients_match_dense():
    s, h, kh, d = 64, 2, 1, 8
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((s, kh, d)), jnp.float32)
    doc, fan, noi = _meta(s, rng, n_docs=2, pad=4)
    mask = train_packed_mask(doc, fan, noi)
    g = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)

    def dense_loss(q_, k_, v_):
        out = dot_attention(
            q_[None], k_[None], v_[None], mask=mask[None],
            precision="float32",
        )[0]
        return jnp.sum(out * g)

    def sparse_loss(q_, k_, v_):
        out = sparse_packed_attention(
            q_, k_, v_, doc, fan, noi, block_q=16, block_k=16,
            interpret=True, bwd_chunk=16,
        )
        return jnp.sum(out * g)

    gd = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(sparse_loss, argnums=(0, 1, 2))(q, k, v)
    from asserts import assert_grad_trees_close
    assert_grad_trees_close(gs, gd, rtol=3e-4, atol=3e-5)


def test_all_padding_rows_are_zero():
    s, h, kh, d = 32, 2, 2, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((s, kh, d)), jnp.float32)
    doc = jnp.zeros((s,), jnp.int32)  # everything padding
    fan = jnp.full((s,), -1, jnp.int32)
    out = sparse_packed_attention(
        q, k, v, doc, fan, fan, block_q=16, block_k=16, interpret=True
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_train_step_sparse_matches_dense():
    """compute_losses(sparse_block=...) == dense-mask path: loss + grads
    (VERDICT r1 next-step #4 'gradient-exact' criterion, tiny scale)."""
    from bagel_tpu.configs import micro_bagel
    from bagel_tpu.data.packing import make_synthetic_batch, stack_batches
    from bagel_tpu.models.bagel import init_bagel_params
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

    def loss_fn(p, sb):
        return compute_losses(p, cfg, batch, noise, ce_weight=1.0,
                              mse_weight=1.0, precision="float32",
                              sparse_block=sb)[0]

    l_dense, g_dense = jax.value_and_grad(lambda p: loss_fn(p, None))(params)
    l_sparse, g_sparse = jax.value_and_grad(lambda p: loss_fn(p, 32))(params)
    from asserts import assert_close_live, assert_grad_trees_close
    assert_close_live(float(l_sparse), float(l_dense), floor=1e-5,
                      rtol=1e-4, name="sparse loss")
    assert_grad_trees_close(g_sparse, g_dense, rtol=3e-3, atol=3e-4,
                            name="sparse grads")
