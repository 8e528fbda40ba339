"""Continuous-batching serving runtime: parity with single-session decode,
slot reuse, and mixed und/gen scheduling (serving/runtime.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.serving.runtime import ServingRuntime


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # sharpen near-uniform random logits so greedy argmax is robust to fp
    # reduction-order noise between batched and single packing
    params["llm"]["lm_head"]["w"] = params["llm"]["lm_head"]["w"] * 8.0
    return BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)


def _sequential(engine, image, prompt, max_new):
    ctx = engine.init_context()
    if image is not None:
        ctx = engine.update_context_image(image, ctx, vae=False, vit=True)
    ctx = engine.update_context_text(prompt, ctx)
    return engine.gen_text(ctx, max_length=max_new)


def test_runtime_chat_parity_and_slot_reuse(engine):
    rng = np.random.default_rng(0)
    images = [
        rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.3,
        None,
        rng.standard_normal((28, 42, 3)).astype(np.float32) * 0.3,
    ]
    prompts = ["what is this?", "just text", "and this?"]

    # slots=2 with 3 requests forces a retire + refill (continuous batching)
    rt = ServingRuntime(engine, slots=2, decode_chunk=3, max_new_default=6)
    rt.start()
    try:
        futs = [rt.submit_chat(p, image=im) for p, im in zip(prompts, images)]
        got = [f.result(timeout=600) for f in futs]
    finally:
        rt.stop()

    assert rt.stats["chat_done"] == 3
    for im, p, g in zip(images, prompts, got):
        want = _sequential(engine, im, p, 6)
        # budget quantization: the runtime retires on eos or budget; compare
        # the prefix up to the shorter of the two
        assert g == want, (p, g, want)


def test_runtime_mixed_und_gen(engine):
    rt = ServingRuntime(engine, slots=2, decode_chunk=2, max_new_default=4)
    rt.start()
    try:
        chat = rt.submit_chat("hello")
        gen = rt.submit_generate(
            "a thing", image_shapes=(64, 64), num_timesteps=3,
            cfg_text_scale=1.0, cfg_img_scale=1.0,
        )
        ans = chat.result(timeout=600)
        out = gen.result(timeout=600)
    finally:
        rt.stop()
    assert isinstance(ans, str) and len(ans) > 0
    assert out["image"].shape == (64, 64, 3) and out["image"].dtype == np.uint8
    assert rt.stats["gen_done"] == 1


def test_runtime_kv_exhaustion_finishes_session(engine):
    """A session whose next chunk would overflow max_kv must be finished
    with what it has (and its slot's length reset) — not kill the scheduler
    thread with an assert, which would hang every future forever."""
    # tiny KV budget: prompt prefill bucket + a chunk or two fills it
    small = BagelEngine(engine.params, engine.cfg, engine.tokenizer,
                        engine.new_token_ids, max_kv=64)
    rt = ServingRuntime(small, slots=2, decode_chunk=16,
                        max_new_default=10_000)
    rt.start()
    try:
        # huge budget so only KV capacity can end the session
        f1 = rt.submit_chat("fill the buffer please")
        ans = f1.result(timeout=600)
        assert isinstance(ans, str)
        # the scheduler must still be alive and serve a fresh request
        # (its slot's stale length must not trip capacity checks either)
        f2 = rt.submit_chat("second request")
        assert isinstance(f2.result(timeout=600), str)
    finally:
        rt.stop()
    assert rt.stats["chat_done"] == 2


def test_runtime_oversized_request_fails_cleanly(engine):
    """A request whose prefill block alone exceeds max_kv is rejected with
    an error on ITS future; it must not corrupt or stall others."""
    small = BagelEngine(engine.params, engine.cfg, engine.tokenizer,
                        engine.new_token_ids, max_kv=32)
    rt = ServingRuntime(small, slots=1, decode_chunk=2, max_new_default=4)
    rt.start()
    try:
        bad = rt.submit_chat("x" * 500)  # way past the 32-token buffer
        with pytest.raises(ValueError):
            bad.result(timeout=600)
        ok = rt.submit_chat("hi")
        assert isinstance(ok.result(timeout=600), str)
    finally:
        rt.stop()


def test_runtime_stop_fails_pending(engine):
    rt = ServingRuntime(engine, slots=1, decode_chunk=2, max_new_default=4)
    # never started: queued request must be failed by stop(), not hang
    fut = rt.submit_chat("will never run")
    rt.start()
    rt.stop()
    with pytest.raises((RuntimeError, TimeoutError)):
        fut.result(timeout=5)


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (2, 2, 2)])
def test_runtime_sharded_mesh(engine, mesh_shape):
    """Continuous batching with GSPMD-sharded weights AND a mesh-sharded
    slot cache (slots over dp, KV heads over tp when divisible) matches the
    unsharded sequential engine — the v5e-8 serving story."""
    from bagel_tpu.parallel import make_mesh, shard_params

    cfg = engine.cfg
    mesh = make_mesh(mesh_shape)
    with mesh:
        sparams = shard_params(mesh, engine.params)
        seng = BagelEngine(sparams, cfg, engine.tokenizer,
                           engine.new_token_ids, max_kv=512)
        rt = ServingRuntime(seng, slots=2, decode_chunk=3,
                            max_new_default=6, mesh=mesh)
        rt.start()
        try:
            futs = [rt.submit_chat(p) for p in ("hello there", "how now")]
            got = [f.result(timeout=600) for f in futs]
        finally:
            rt.stop()
    for p, g in zip(("hello there", "how now"), got):
        assert g == _sequential(engine, None, p, 6), (p, g)


def test_runtime_multi_image_request(engine):
    """A chat request carrying a LIST of images must match the sequential
    session that prefills those images in order (interleaved-chat shape)."""
    rng = np.random.default_rng(5)
    mk = lambda h, w: rng.standard_normal((h, w, 3)).astype(np.float32) * 0.3
    imgs = [mk(28, 28), mk(28, 42)]
    prompt = "compare these"

    rt = ServingRuntime(engine, slots=2, decode_chunk=3, max_new_default=6)
    rt.start()
    try:
        got = rt.submit_chat(prompt, image=imgs).result(timeout=600)
    finally:
        rt.stop()

    ctx = engine.init_context()
    for im in imgs:
        ctx = engine.update_context_image(im, ctx, vae=False, vit=True)
    ctx = engine.update_context_text(prompt, ctx)
    assert got == engine.gen_text(ctx, max_length=6)


def test_runtime_speculative_parity(engine):
    """speculative=K inside the chunked scheduler is greedy-exact: same
    completions as the plain runtime, including slot reuse and eos/budget
    retirement. Repetitive prompts make the lookup actually fire."""
    rng = np.random.default_rng(7)
    images = [None, rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.3,
              None]
    prompts = [
        "repeat repeat repeat the repeat pattern repeat",
        "what is shown here? what is shown?",
        "the quick brown fox and the quick brown fox",
    ]

    def run(spec):
        rt = ServingRuntime(engine, slots=2, decode_chunk=4,
                            max_new_default=8, speculative=spec, ngram=2)
        rt.start()
        try:
            futs = [rt.submit_chat(p, image=im)
                    for p, im in zip(prompts, images)]
            return [f.result(timeout=600) for f in futs]
        finally:
            rt.stop()

    plain = run(0)
    spec = run(3)
    assert spec == plain


def test_runtime_sharded_mesh_speculative(engine):
    """Speculative chunks compose with the mesh-sharded slot cache: the
    verify-block extend, per-row length rollback, and n-gram gathers all
    lower under GSPMD, and output stays greedy-exact."""
    from bagel_tpu.parallel import make_mesh, shard_params

    cfg = engine.cfg
    mesh = make_mesh((1, 2, 4))
    prompts = ("repeat after me repeat after", "hello hello hello there")
    with mesh:
        sparams = shard_params(mesh, engine.params)
        seng = BagelEngine(sparams, cfg, engine.tokenizer,
                           engine.new_token_ids, max_kv=512)
        rt = ServingRuntime(seng, slots=2, decode_chunk=3,
                            max_new_default=6, mesh=mesh, speculative=2,
                            ngram=2)
        rt.start()
        try:
            futs = [rt.submit_chat(p) for p in prompts]
            got = [f.result(timeout=600) for f in futs]
        finally:
            rt.stop()
    for p, g in zip(prompts, got):
        assert g == _sequential(engine, None, p, 6), (p, g)


def test_exclusive_jobs_inherit_runtime_speculative(engine):
    # think/understanding jobs ride the exclusive queue; they must pick up
    # the runtime's speculative K (a request-pinned value wins)
    rt = ServingRuntime(engine, slots=2, speculative=5)
    seen = []

    def recorder(**kw):
        seen.append(kw)
        return {"text": "ok"}

    rt.engine = recorder
    rt.submit_generate("q", understanding_output=True)
    rt.submit_generate("q", understanding_output=True, speculative=0)
    rt._run_gen_jobs()
    rt._run_gen_jobs()
    assert seen[0]["speculative"] == 5
    assert seen[1]["speculative"] == 0
