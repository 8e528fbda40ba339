"""Batched understanding: chat_batch must reproduce per-session results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import init_bagel_params


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # random-init logits are near-uniform; sharpen them so greedy argmax is
    # robust to fp reduction-order noise between batched and single packing
    params["llm"]["lm_head"]["w"] = params["llm"]["lm_head"]["w"] * 8.0
    return BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)


def test_chat_batch_matches_sequential(engine):
    rng = np.random.default_rng(0)
    images = [
        rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.3,
        rng.standard_normal((28, 42, 3)).astype(np.float32) * 0.3,
        None,  # text-only row
    ]
    prompts = ["what is this?", "and this?", "just text"]

    batched = engine.chat_batch(images, prompts, max_length=6)
    assert len(batched) == 3

    for img, prompt, got in zip(images, prompts, batched):
        ctx = engine.init_context()
        if img is not None:
            ctx = engine.update_context_image(img, ctx, vae=False, vit=True)
        ctx = engine.update_context_text(prompt, ctx)
        single = engine.gen_text(ctx, max_length=6)
        assert got == single, (prompt, got, single)


def test_chat_batch_mixed_lengths(engine):
    rng = np.random.default_rng(1)
    images = [rng.standard_normal((28, 28, 3)).astype(np.float32)] * 2
    prompts = ["a", "a much longer question about the same exact image?"]
    outs = engine.chat_batch(images, prompts, max_length=4)
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)


def test_chat_batch_multi_image_rows(engine):
    """Rows with >1 image (interleaved-chat shape, bagel.py:1004-1055) must
    match sequential sessions that prefill the same images in order —
    including a mixed batch where rows carry 2, 1 and 0 images."""
    rng = np.random.default_rng(2)
    mk = lambda h, w: rng.standard_normal((h, w, 3)).astype(np.float32) * 0.3
    images = [
        [mk(28, 28), mk(28, 42)],  # two images, different sizes
        mk(42, 28),                # single image (bare ndarray still works)
        None,                      # text-only
    ]
    prompts = ["compare the two images", "what is this?", "hello"]

    batched = engine.chat_batch(images, prompts, max_length=6)

    for imgs, prompt, got in zip(images, prompts, batched):
        ctx = engine.init_context()
        seq = [] if imgs is None else (
            [imgs] if isinstance(imgs, np.ndarray) else imgs
        )
        for im in seq:
            ctx = engine.update_context_image(im, ctx, vae=False, vit=True)
        ctx = engine.update_context_text(prompt, ctx)
        single = engine.gen_text(ctx, max_length=6)
        assert got == single, (prompt, got, single)
