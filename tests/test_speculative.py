"""Prompt-lookup speculative decoding: greedy-exact parity + draft quality.

The contract of inference/speculative.py is that speculative greedy decode
emits EXACTLY the tokens of the plain loop (qwen2.decode_text greedy) — the
verify pass accepts precisely the prefix the full model would have
produced. No reference counterpart (the reference decodes token-by-token,
bagel.py:930-1000)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_qwen2
from bagel_tpu.inference.speculative import decode_text_spec, ngram_propose
from bagel_tpu.models.qwen2 import (
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


def test_ngram_propose_finds_latest_continuation():
    #           0  1  2  3  4  5  6  7  8  9 10 11
    ctx = jnp.asarray(
        [[7, 8, 9, 1, 2, 7, 8, 5, 6, 0, 7, 8]], jnp.int32
    )
    # trailing 2-gram (7, 8) at positions 10-11; the latest earlier match
    # is at 5-6 -> continuation is [5, 6, 0]
    draft = ngram_propose(ctx, jnp.asarray([12]), n=2, k=3)
    assert draft.tolist() == [[5, 6, 0]]

    # no earlier occurrence of (2, 7): fallback draft, shape still [1, k]
    ctx2 = jnp.asarray([[1, 1, 1, 1, 2, 7]], jnp.int32)
    d2 = ngram_propose(ctx2, jnp.asarray([6]), n=2, k=3)
    assert d2.shape == (1, 3)


def _prefill(cfg, params, ids, max_len):
    b, t = ids.shape
    cache = kv_cache_init(cfg, b, max_len, dtype=jnp.float32)
    embeds = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    _, cache = llm_extend(
        params, cfg, embeds, pos, cache, jnp.full((b,), t, jnp.int32),
        und_len=t, causal=True, update_cache=True, precision=PREC,
    )
    return cache


@pytest.mark.parametrize("draft_len,ngram", [(4, 2), (7, 3)])
def test_spec_decode_matches_plain_greedy(cfg, params, draft_len, ngram):
    """Token-exact parity on a 2-row batch: one prompt with heavy
    repetition (lookup hits), one random (drafts mostly rejected)."""
    rng = np.random.default_rng(3)
    rep = np.tile([11, 23, 42, 7], 6)  # repetitive row
    rnd = rng.integers(3, cfg.vocab_size, 24)  # random row
    ids = jnp.asarray(np.stack([rep, rnd]), jnp.int32)
    t = ids.shape[1]
    max_steps = 16

    cache_a = _prefill(cfg, params, ids, 128)
    cache_b = _prefill(cfg, params, ids, 128)
    start = jnp.asarray([1, 1], jnp.int32)
    pos = jnp.asarray([t, t], jnp.int32)

    plain, _ = decode_text(
        params, cfg, cache_a, start, pos, max_steps=max_steps, eos_id=2,
        precision=PREC,
    )
    spec, cache_s = decode_text_spec(
        params, cfg, cache_b, start, pos, ids, jnp.asarray([t, t]),
        max_steps=max_steps, eos_id=2, draft_len=draft_len, ngram=ngram,
        precision=PREC,
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(spec))

    # rollback bookkeeping: cache holds exactly the consumed inputs —
    # prefill t plus one entry per emitted token (rejected drafts rolled
    # back). A row that stopped at eos consumed eos_idx+1 inputs; a row
    # that ran out of budget consumed at least max_steps.
    toks = np.asarray(spec)
    lens = np.asarray(cache_s.length)
    for r in range(2):
        row = toks[r].tolist()
        if 2 in row:
            assert int(lens[r]) == t + row.index(2) + 1
        else:
            # emission is capped at the budget, so the cache holds exactly
            # the delivered tokens (chunked-caller contract)
            assert int(lens[r]) == t + max_steps


def test_spec_decode_respects_active_mask(cfg, params):
    """Rows with active=False stay frozen (eos output, cache untouched) —
    the serving-runtime contract of decode_text."""
    ids = jnp.asarray(np.tile([5, 9, 13], 4)[None].repeat(2, 0), jnp.int32)
    t = ids.shape[1]
    cache = _prefill(cfg, params, ids, 96)
    len0 = np.asarray(cache.length).copy()
    spec, cache2 = decode_text_spec(
        params, cfg, cache, jnp.asarray([1, 1], jnp.int32),
        jnp.asarray([t, t]), ids, jnp.asarray([t, t]),
        max_steps=8, eos_id=2, draft_len=4, ngram=2, precision=PREC,
        active=jnp.asarray([True, False]),
    )
    toks = np.asarray(spec)
    assert (toks[1] == 2).all()  # frozen row: eos padding only
    assert int(np.asarray(cache2.length)[1]) == int(len0[1])


def test_engine_gen_text_speculative_matches_plain():
    """Engine surface: gen_text(speculative=K) returns the same string as
    the plain greedy decode, with the session's text history as the
    lookup corpus."""
    from bagel_tpu.configs import tiny_bagel
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.inference.engine import BagelEngine
    from bagel_tpu.models.bagel import init_bagel_params

    bcfg = tiny_bagel()
    tok = MockTokenizer(vocab_size=bcfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), bcfg, dtype=jnp.float32)
    eng = BagelEngine(params, bcfg, tok, tok.new_token_ids, max_kv=512)

    ctx = eng.init_context()
    ctx = eng.update_context_text(
        "the quick brown fox jumps over the lazy dog; "
        "the quick brown fox jumps again", ctx)
    assert len(ctx.text_ids) > 0  # history recorded for the lookup

    plain = eng.gen_text(ctx, max_length=12)
    spec = eng.gen_text(ctx, max_length=12, speculative=4, ngram=2)
    assert spec == plain
