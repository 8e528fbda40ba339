"""Multi-host serving frontend (serving/multihost.py): lockstep determinism.

A real pod runs one process per host; here the leader and one follower run
as two frontends in one process over a LocalBus — exactly the replay
contract JaxHostBus carries over the JAX distributed runtime. The follower
must execute the identical tick sequence (same admissions, same decode
chunks, same gen jobs) purely from the broadcast ingress records.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.serving.multihost import (LocalBus, MultiHostFrontend,
                                         serve_multihost)
from bagel_tpu.serving.runtime import ServingRuntime


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["llm"]["lm_head"]["w"] = params["llm"]["lm_head"]["w"] * 8.0
    return BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)


def _sequential(engine, image, prompt, max_new):
    ctx = engine.init_context()
    if image is not None:
        ctx = engine.update_context_image(image, ctx, vae=False, vit=True)
    ctx = engine.update_context_text(prompt, ctx)
    return engine.gen_text(ctx, max_length=max_new)


def test_lockstep_leader_follower(engine):
    rng = np.random.default_rng(0)
    images = [rng.standard_normal((28, 28, 3)).astype(np.float32) * 0.3,
              None, None]
    prompts = ["what is this?", "just text", "another one"]

    bus = LocalBus(n_followers=1)
    leader = MultiHostFrontend(
        ServingRuntime(engine, slots=2, decode_chunk=3, max_new_default=6),
        bus=bus, leader=True)
    follower = MultiHostFrontend(
        ServingRuntime(engine, slots=2, decode_chunk=3, max_new_default=6),
        bus=bus, leader=False)
    follower.start()
    leader.start()
    try:
        futs = [leader.submit_chat(p, image=im)
                for p, im in zip(prompts, images)]
        gen = leader.submit_generate(
            "a thing", image_shapes=(64, 64), num_timesteps=3,
            cfg_text_scale=1.0, cfg_img_scale=1.0)
        got = [f.result(timeout=600) for f in futs]
        img = gen.result(timeout=600)
    finally:
        leader.stop()
        follower.join(timeout=120)

    # leader answers match the single-session decode
    for im, p, g in zip(images, prompts, got):
        assert g == _sequential(engine, im, p, 6), p
    assert img["image"].shape == (64, 64, 3)

    # the follower replayed the identical schedule: same completions, same
    # number of decode chunks, same emitted-token count, same gen jobs
    assert follower.stats == leader.stats
    assert leader.stats["chat_done"] == 3 and leader.stats["gen_done"] == 1

    # followers refuse direct traffic (requests must route via the leader)
    with pytest.raises(AssertionError):
        follower.submit_chat("nope")


def test_single_process_fallback(engine):
    # jax.process_count()==1 here: serve_multihost degrades to a plain
    # leader (no bus) with the ServingRuntime surface the HTTP server uses
    fe = serve_multihost(engine, slots=2, decode_chunk=4,
                         max_new_default=5)
    assert fe.leader and fe.bus is None
    fe.start()
    try:
        out = fe.submit_chat("hello").result(timeout=600)
    finally:
        fe.stop()
    assert out == _sequential(engine, None, "hello", 5)
    assert fe.stats["chat_done"] == 1
