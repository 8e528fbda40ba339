"""Golden tests: bagel_tpu.ops vs the PyTorch reference (CPU oracle)."""

import numpy as np
import pytest
import torch

import refutil  # noqa: F401  (installs reference path + stubs)

import jax
import jax.numpy as jnp

from bagel_tpu.ops import (
    cache_block_mask,
    dot_attention,
    rms_norm,
    layer_norm,
    rope_cos_sin,
    apply_rope,
    apply_rope_2d,
    rope_2d_tables,
    sincos_2d_grid,
    timestep_embedding,
    train_packed_mask,
    segment_mask,
    flattened_position_ids_extrapolate,
    flattened_position_ids_interpolate,
)


def test_rms_norm_matches_reference(rng):
    from modeling.qwen2.modeling_qwen2 import Qwen2RMSNorm

    x = rng.standard_normal((7, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    ref = Qwen2RMSNorm(64, eps=1e-6)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w))
        expected = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_rope_matches_reference(rng):
    from modeling.qwen2.configuration_qwen2 import Qwen2Config as RefCfg
    from modeling.qwen2.modeling_qwen2 import (
        Qwen2RotaryEmbedding,
        apply_rotary_pos_emb,
    )

    S, H, KH, D = 11, 4, 2, 32
    cfg = RefCfg(
        hidden_size=H * D,
        num_attention_heads=H,
        num_key_value_heads=KH,
        rope_theta=10000.0,
        max_position_embeddings=128,
    )
    rot = Qwen2RotaryEmbedding(config=cfg)
    pos = np.array([0, 1, 2, 5, 5, 5, 6, 9, 100, 101, 102], dtype=np.int64)
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, KH, D)).astype(np.float32)

    cos_t, sin_t = rot(torch.from_numpy(q), torch.from_numpy(pos)[None, :])
    q_ref, k_ref = apply_rotary_pos_emb(
        torch.from_numpy(q), torch.from_numpy(k),
        cos_t.squeeze(0), sin_t.squeeze(0), unsqueeze_dim=1,
    )

    # atol 1e-3: torch and XLA-CPU disagree in the last fp32 bits of cos/sin
    # for large position*freq arguments (pure transcendental rounding).
    cos, sin = rope_cos_sin(jnp.asarray(pos), D, 10000.0)
    q_got, k_got = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)
    np.testing.assert_allclose(np.asarray(q_got), q_ref.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(k_got), k_ref.numpy(), rtol=1e-3, atol=1e-3)


def test_rope_2d_matches_reference(rng):
    from modeling.bagel.siglip_navit import (
        RotaryEmbedding2D,
        apply_rotary_pos_emb as ref_apply_2d,
    )

    max_h = max_w = 5
    D = 32  # head_dim
    ref = RotaryEmbedding2D(D // 2, max_h, max_w)
    cos_h, sin_h, cos_w, sin_w = rope_2d_tables(D // 2, max_h, max_w)
    np.testing.assert_allclose(np.asarray(cos_h), ref.cos_h.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_w), ref.sin_w.numpy(), rtol=1e-5, atol=1e-6)

    S, H = 9, 3
    pos_ids = rng.integers(0, max_h * max_w, size=S)
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    k = rng.standard_normal((S, H, D)).astype(np.float32)

    qt, kt = torch.from_numpy(q), torch.from_numpy(k)
    qh, qw = qt[..., : D // 2], qt[..., D // 2:]
    kh, kw = kt[..., : D // 2], kt[..., D // 2:]
    pos_t = torch.from_numpy(pos_ids)
    qh_r, kh_r = ref_apply_2d(qh, kh, ref.cos_h[pos_t], ref.sin_h[pos_t])
    qw_r, kw_r = ref_apply_2d(qw, kw, ref.cos_w[pos_t], ref.sin_w[pos_t])
    q_ref = torch.cat([qh_r, qw_r], dim=-1).numpy()
    k_ref = torch.cat([kh_r, kw_r], dim=-1).numpy()

    idx = jnp.asarray(pos_ids)
    q_got, k_got = apply_rope_2d(
        jnp.asarray(q), jnp.asarray(k),
        cos_h[idx], sin_h[idx], cos_w[idx], sin_w[idx],
    )
    np.testing.assert_allclose(np.asarray(q_got), q_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_got), k_ref, rtol=2e-5, atol=2e-5)


def test_sincos_2d_matches_reference():
    from modeling.bagel.modeling_utils import get_2d_sincos_pos_embed

    got = np.asarray(sincos_2d_grid(64, 7))
    expected = get_2d_sincos_pos_embed(64, 7)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_timestep_embedding_matches_reference():
    from modeling.bagel.modeling_utils import TimestepEmbedder

    t = np.array([0.0, 0.25, 0.5, 0.999, 1.0], dtype=np.float32)
    expected = TimestepEmbedder.timestep_embedding(
        torch.from_numpy(t), 256
    ).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_flattened_position_ids_match_reference():
    from data.data_utils import (
        get_flattened_position_ids_extrapolate,
        get_flattened_position_ids_interpolate,
    )

    for (h, w, p, m) in [(56, 84, 14, 70), (28, 28, 14, 70), (128, 64, 16, 64)]:
        ref = get_flattened_position_ids_extrapolate(h, w, p, m).numpy()
        got = np.asarray(flattened_position_ids_extrapolate(h, w, p, m))
        np.testing.assert_array_equal(got, ref)

        ref_i = get_flattened_position_ids_interpolate(h, w, p, m).numpy()
        got_i = np.asarray(flattened_position_ids_interpolate(h, w, p, m))
        np.testing.assert_array_equal(got_i, ref_i)


def test_train_packed_mask_matches_flex_predicate():
    """Compare against create_sparse_mask's composed predicate evaluated
    pointwise (data_utils.py:13-40)."""
    from data.data_utils import create_sparse_mask

    sample_lens = [10, 14]
    split_lens = [3, 4, 3, 5, 6, 3]
    attn_modes = ["causal", "full", "noise", "causal", "noise", "causal"]

    mask_fn = create_sparse_mask(sample_lens, split_lens, attn_modes, "cpu")
    S = sum(sample_lens)
    qi = torch.arange(S)[:, None].expand(S, S)
    kj = torch.arange(S)[None, :].expand(S, S)
    expected = (
        mask_fn(torch.tensor(0), torch.tensor(0), qi.reshape(-1), kj.reshape(-1))
        .reshape(S, S)
        .numpy()
    )

    document_id, fan_id, noise_id = [], [], []
    for i, l in enumerate(sample_lens):
        document_id += [i + 1] * l
    for i, (l, m) in enumerate(zip(split_lens, attn_modes)):
        fan_id += [i if m in ("full", "noise") else -1] * l
        noise_id += [i if m == "noise" else -1] * l

    got = np.asarray(
        train_packed_mask(
            jnp.asarray(document_id, dtype=jnp.int32),
            jnp.asarray(fan_id, dtype=jnp.int32),
            jnp.asarray(noise_id, dtype=jnp.int32),
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_train_packed_mask_matches_dense_builder():
    """Cross-check with prepare_attention_mask_per_sample (data_utils.py:72-103)
    for a single sample."""
    from data.data_utils import prepare_attention_mask_per_sample

    split_lens = [4, 6, 5]
    attn_modes = ["causal", "noise", "causal"]
    ref_bias = prepare_attention_mask_per_sample(split_lens, attn_modes).numpy()
    expected = ref_bias == 0

    S = sum(split_lens)
    document_id = [1] * S
    fan_id, noise_id = [], []
    for i, (l, m) in enumerate(zip(split_lens, attn_modes)):
        fan_id += [i if m in ("full", "noise") else -1] * l
        noise_id += [i if m == "noise" else -1] * l
    got = np.asarray(
        train_packed_mask(
            jnp.asarray(document_id, dtype=jnp.int32),
            jnp.asarray(fan_id, dtype=jnp.int32),
            jnp.asarray(noise_id, dtype=jnp.int32),
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_dot_attention_matches_sdpa(rng):
    B, Sq, Skv, H, KH, D = 2, 6, 9, 4, 2, 16
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Skv, KH, D)).astype(np.float32)
    v = rng.standard_normal((B, Skv, KH, D)).astype(np.float32)
    mask = rng.random((B, Sq, Skv)) > 0.3
    mask[:, :, 0] = True  # every query sees at least one key

    got = np.asarray(
        dot_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      mask=jnp.asarray(mask), precision="float32")
    )

    qt = torch.from_numpy(q).permute(0, 2, 1, 3)  # [B, H, Sq, D]
    kt = torch.from_numpy(k).permute(0, 2, 1, 3)
    vt = torch.from_numpy(v).permute(0, 2, 1, 3)
    expected = torch.nn.functional.scaled_dot_product_attention(
        qt, kt, vt,
        attn_mask=torch.from_numpy(mask)[:, None, :, :],
        enable_gqa=True,
    ).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_cache_block_mask_semantics():
    # 1 sample: past_len=3, block of 4 queries (all valid), causal.
    m = np.asarray(
        cache_block_mask(10, 4, jnp.asarray([3]), jnp.asarray([4]), causal=True)
    )[0]
    # query 0 sees keys 0..3, query 3 sees keys 0..6
    assert m[0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
    assert m[3].tolist() == [1, 1, 1, 1, 1, 1, 1, 0, 0, 0]

    # full (non-causal): every valid query sees all past+block keys
    m = np.asarray(
        cache_block_mask(10, 4, jnp.asarray([3]), jnp.asarray([4]), causal=False)
    )[0]
    assert m[0].tolist() == [1, 1, 1, 1, 1, 1, 1, 0, 0, 0]

    # padded queries (valid=2 of 4) masked out entirely
    m = np.asarray(
        cache_block_mask(10, 4, jnp.asarray([3]), jnp.asarray([2]), causal=True)
    )[0]
    assert not m[2].any() and not m[3].any()
    assert m[1].tolist() == [1, 1, 1, 1, 1, 0, 0, 0, 0, 0]


def test_segment_mask():
    seg = jnp.asarray([[1, 1, 2, 2, 0]])
    m = np.asarray(segment_mask(seg))[0]
    assert m[0].tolist() == [1, 1, 0, 0, 0]
    assert m[2].tolist() == [0, 0, 1, 1, 0]
    assert not m[4].any()


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((5, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    expected = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b),
        eps=1e-6,
    ).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
