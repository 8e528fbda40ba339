"""Fused QKV / gate-up projections must be output-identical to the
canonical per-leaf layout in every dtype mode and on every path (block
extend with mixed experts, decode, packed train forward, sharded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_qwen2
from bagel_tpu.models import qwen2
from bagel_tpu.models.qwen2 import fuse_llm_params, init_qwen2_params
from bagel_tpu.utils.quant import quantize_llm_params

PREC = "float32"


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_qwen2(layer_module="mot", qk_norm=True)
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


def _extend(params, cfg, und_len):
    b, t, d = 1, 8, cfg.hidden_size
    embeds = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, t, d)), jnp.float32
    )
    cache = qwen2.kv_cache_init(cfg, b, 32, jnp.float32)
    pos = jnp.arange(t)[None]
    out, new_cache = qwen2.llm_extend(
        params, cfg, embeds, pos, cache, jnp.asarray([t]),
        und_len=und_len, causal=False, update_cache=True, precision=PREC,
    )
    return np.asarray(out), np.asarray(new_cache.k)


@pytest.mark.parametrize("mode", [None, "int8", "w8a8", "int4", "nf4"])
@pytest.mark.parametrize("und_len", [8, 0, 3])
def test_fused_extend_parity(setup, mode, und_len):
    cfg, params = setup
    p = quantize_llm_params(params, mode) if mode else params
    fused = fuse_llm_params(p)
    out_a, k_a = _extend(p, cfg, und_len)
    out_b, k_b = _extend(fused, cfg, und_len)
    np.testing.assert_allclose(out_b, out_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(k_b, k_a, rtol=1e-5, atol=1e-5)


def test_fuse_idempotent(setup):
    cfg, params = setup
    f1 = fuse_llm_params(params)
    f2 = fuse_llm_params(f1)
    for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(f2)):
        assert a is b or np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_train_forward_parity(setup):
    cfg, params = setup
    s, d = 16, cfg.hidden_size
    rng = np.random.default_rng(1)
    packed = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)
    pos = jnp.arange(s)
    gen_mask = jnp.asarray(rng.integers(0, 2, s).astype(bool))
    mask = jnp.ones((s, s), bool)

    def run(p):
        return np.asarray(qwen2.llm_forward_train(
            p, cfg, packed, pos, mask, gen_mask, precision=PREC, remat=False,
        ))

    np.testing.assert_allclose(
        run(fuse_llm_params(params)), run(params), rtol=1e-5, atol=1e-5
    )


def test_fused_decode_and_sharded(setup):
    """Greedy decode tokens identical fused vs unfused, including with the
    fused leaves sharded over a (1, 2, 4) mesh."""
    from bagel_tpu.parallel import make_mesh, shard_params

    cfg, params = setup
    sharp = dict(params)
    sharp["lm_head"] = {"w": params["lm_head"]["w"] * 8.0}

    def decode(p):
        cache = qwen2.kv_cache_init(cfg, 1, 32, jnp.float32)
        ids = jnp.asarray([[5, 7, 11]], jnp.int32)
        _, cache = qwen2.llm_extend(
            p, cfg, qwen2.embed_tokens(p, ids), jnp.arange(3)[None], cache,
            jnp.asarray([3]), und_len=3, causal=True, update_cache=True,
            precision=PREC,
        )
        toks, _ = qwen2.decode_text(
            p, cfg, cache, jnp.asarray([1]), jnp.asarray([3]),
            max_steps=5, eos_id=-1, precision=PREC,
        )
        return np.asarray(toks)

    want = decode(sharp)
    fused = fuse_llm_params(sharp)
    np.testing.assert_array_equal(decode(fused), want)

    mesh = make_mesh((1, 2, 4))
    with mesh:
        sf = shard_params(mesh, {"llm": fused})["llm"]
        np.testing.assert_array_equal(decode(sf), want)


def test_fuse_inplace_frees_originals(setup):
    """inplace=True drops the unfused leaves from the ORIGINAL dicts (the
    memory-bounded path for full-depth single-chip serving) and matches the
    non-inplace result."""
    import copy

    cfg, params = setup
    a = copy.deepcopy(params)
    b = copy.deepcopy(params)
    fa = fuse_llm_params(a, inplace=True)
    fb = fuse_llm_params(b)
    assert fa is a and "q" not in a["layers"]["attn"]
    assert "gate" not in a["layers"]["mlp"]
    for x, y in zip(jax.tree.leaves(fa), jax.tree.leaves(fb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
