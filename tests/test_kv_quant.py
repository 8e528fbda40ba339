"""int8 KV cache: quantization error bounds, extend/decode parity vs the
bf16/f32 cache, and the continuous-batching runtime on a quantized cache.

Beyond-reference feature: the reference's NaiveCache is plain bf16 torch
tensors (qwen2_navit.py:207-233). Storing KV as int8 codes + per-(token,
head) scales halves cache HBM — the binding constraint on serving slot
count (serving/runtime.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel, tiny_qwen2
from bagel_tpu.models.qwen2 import (
    _kv_dequantize,
    _kv_quantize,
    decode_text,
    embed_tokens,
    init_qwen2_params,
    kv_cache_init,
    llm_extend,
)

PREC = "float32"


@pytest.fixture(scope="module")
def cfg():
    return tiny_qwen2(layer_module="mot")


@pytest.fixture(scope="module")
def params(cfg):
    return init_qwen2_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


def test_quantize_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 4, 32))
    q, s = _kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 16, 4)
    back = _kv_dequantize(q, s, jnp.float32)
    # symmetric rounding: error per element <= scale/2 = amax/(2*127)
    bound = np.asarray(jnp.max(jnp.abs(x), axis=-1) / (2 * 127.0) + 1e-6)
    err = np.abs(np.asarray(back) - np.asarray(x))
    assert (err <= bound[..., None]).all()


def test_cache_init_int8_has_scales(cfg):
    cache = kv_cache_init(cfg, 2, 32, jnp.int8)
    assert cache.k.dtype == jnp.int8
    assert cache.k_scale.shape == cache.k.shape[:-1]
    assert cache.v_scale.dtype == jnp.float32
    cache_f = kv_cache_init(cfg, 2, 32, jnp.float32)
    assert cache_f.k_scale is None and cache_f.v_scale is None


def _run_session(cfg, params, cache_dtype, T=10, decode_steps=4):
    """Prefill T tokens then extend one-by-one; return (hiddens, cache)."""
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, T + decode_steps),
                             0, cfg.vocab_size)
    pos = jnp.arange(T + decode_steps)[None, :]
    embeds = embed_tokens(params, ids)
    cache = kv_cache_init(cfg, 1, 32, cache_dtype)
    hs = []
    h, cache = llm_extend(
        params, cfg, embeds[:, :T], pos[:, :T], cache, jnp.asarray([T]),
        und_len=T, causal=True, update_cache=True, precision=PREC,
    )
    hs.append(np.asarray(h))
    for i in range(T, T + decode_steps):
        h, cache = llm_extend(
            params, cfg, embeds[:, i : i + 1], pos[:, i : i + 1], cache,
            jnp.asarray([1]), und_len=1, causal=True, update_cache=True,
            precision=PREC,
        )
        hs.append(np.asarray(h))
    return np.concatenate(hs, axis=1), cache


def test_extend_int8_cache_close_to_f32(cfg, params):
    ref, cache_f = _run_session(cfg, params, jnp.float32)
    got, cache_q = _run_session(cfg, params, jnp.int8)
    assert cache_q.k.dtype == jnp.int8
    # scales were written for the occupied prefix of every layer
    assert (np.asarray(cache_q.k_scale[:, 0, :14]) > 0).all()
    assert int(cache_q.length[0]) == int(cache_f.length[0]) == 14
    # per-(token, head) int8 KV: sub-percent relative error on hiddens
    scale = np.abs(ref).mean()
    assert np.abs(got - ref).mean() < 0.02 * scale, (
        np.abs(got - ref).mean(), scale)


def test_decode_text_int8_active_mask(cfg, params):
    """decode_text over an int8 cache: inactive rows stay frozen and the
    emitted tokens agree with the f32-cache decode on a sharpened head."""
    sharp = dict(params)
    sharp["lm_head"] = {"w": params["lm_head"]["w"] * 8.0}

    def prefill_and_decode(dtype):
        T = 6
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, T), 0,
                                 cfg.vocab_size)
        embeds = embed_tokens(sharp, ids)
        pos = jnp.broadcast_to(jnp.arange(T)[None], (2, T))
        cache = kv_cache_init(cfg, 2, 32, dtype)
        _, cache = llm_extend(
            sharp, cfg, embeds, pos, cache, jnp.asarray([T, T]),
            und_len=T, causal=True, update_cache=True, precision=PREC,
        )
        toks, cache = decode_text(
            sharp, cfg, cache, jnp.asarray([1, 1]), jnp.asarray([T, T]),
            max_steps=5, eos_id=0, active=jnp.asarray([True, False]),
            precision=PREC,
        )
        return np.asarray(toks), cache

    toks_f, cache_f = prefill_and_decode(jnp.float32)
    toks_q, cache_q = prefill_and_decode(jnp.int8)
    np.testing.assert_array_equal(toks_f, toks_q)
    # frozen row: cache length untouched by decode
    assert int(cache_q.length[1]) == 6
    assert int(cache_q.length[0]) > 6


def test_serving_runtime_kv_quant_matches_sequential():
    """End-to-end: ServingRuntime on an int8 slot cache reproduces the
    unquantized single-session answers (tiny model, sharpened head)."""
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.inference.engine import BagelEngine
    from bagel_tpu.models.bagel import init_bagel_params
    from bagel_tpu.serving.runtime import ServingRuntime

    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["llm"]["lm_head"]["w"] = params["llm"]["lm_head"]["w"] * 8.0
    eng_ref = BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)
    eng_q = BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512,
                        kv_quant=True)
    assert eng_q.kv_dtype == jnp.int8

    rng = np.random.default_rng(0)
    image = rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.3
    prompts = ["what is this?", "just text"]
    images = [image, None]

    rt = ServingRuntime(eng_q, slots=2, decode_chunk=3, max_new_default=6)
    assert rt.cache.k.dtype == jnp.int8
    rt.start()
    try:
        futs = [rt.submit_chat(p, image=im)
                for p, im in zip(prompts, images)]
        got = [f.result(timeout=600) for f in futs]
    finally:
        rt.stop()

    for im, p, g in zip(images, prompts, got):
        ctx = eng_ref.init_context()
        if im is not None:
            ctx = eng_ref.update_context_image(im, ctx, vae=False, vit=True)
        ctx = eng_ref.update_context_text(p, ctx)
        want = eng_ref.gen_text(ctx, max_length=6)
        assert g == want, (p, g, want)
