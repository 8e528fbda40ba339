"""Multi-chip serving path: engine inference with GSPMD-sharded weights.

This is the v5e-8 serving story (replaces the reference's accelerate
per-layer device_map, app.py:75-113): shard the weights over the mesh and
run the same jitted inference functions unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import micro_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.parallel import make_mesh, shard_params


def _engine(params, cfg, tok):
    return BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=512)


def _randomize_llm2vae(params):
    # zero llm2vae (reference init parity) would freeze the flow: the
    # sharded-vs-unsharded comparison would only exercise the VAE decode
    # of unchanged noise, not the partitioned LLM math (r4 finding)
    params["llm2vae"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(7), params["llm2vae"]["w"].shape, jnp.float32
    )
    return params


def test_sharded_inference_matches_unsharded():
    cfg = micro_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = _randomize_llm2vae(
        init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32))

    kwargs = dict(
        text="hello world", image_shapes=(16, 16), num_timesteps=3,
        cfg_text_scale=2.0, cfg_img_scale=1.0, timestep_shift=1.0,
        rng=jax.random.PRNGKey(3),
    )
    plain = _engine(params, cfg, tok)(**kwargs)["image"]

    mesh = make_mesh((1, 2, 4))
    with mesh:
        sparams = shard_params(mesh, params)
        sharded = _engine(sparams, cfg, tok)(**kwargs)["image"]

    # same math, different partitioning: images should be nearly identical
    diff = np.abs(plain.astype(np.int32) - sharded.astype(np.int32))
    assert diff.mean() < 2.0, diff.mean()


def test_sharded_w8a8_inference_runs():
    """Quantized serving over the mesh: int8 MXU dots must compose with
    GSPMD sharding (the v5e-8 --quant w8a8 --mesh 1,8,1 config)."""
    from bagel_tpu.utils.quant import quantize_bagel_params

    cfg = micro_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = _randomize_llm2vae(
        init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    qparams = quantize_bagel_params(params, "w8a8")

    kwargs = dict(
        text="hello world", image_shapes=(16, 16), num_timesteps=3,
        cfg_text_scale=2.0, cfg_img_scale=1.0, timestep_shift=1.0,
        rng=jax.random.PRNGKey(3),
    )
    plain = _engine(qparams, cfg, tok)(**kwargs)["image"]
    mesh = make_mesh((1, 2, 4))
    with mesh:
        sq = shard_params(mesh, qparams)
        sharded = _engine(sq, cfg, tok)(**kwargs)["image"]
    diff = np.abs(plain.astype(np.int32) - sharded.astype(np.int32))
    assert diff.mean() < 2.0, diff.mean()


def test_sharded_understanding():
    cfg = micro_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = make_mesh((1, 4, 2))
    with mesh:
        sparams = shard_params(mesh, params)
        eng = _engine(sparams, cfg, tok)
        img = np.random.default_rng(0).standard_normal((28, 28, 3)).astype(np.float32) * 0.3
        out = eng(image=img, text="what?", understanding_output=True,
                  max_think_token_n=6)
    assert isinstance(out["text"], str) and out["text"]


def test_sharded_quantized_inference():
    """int8 weight-only + mesh sharding compose."""
    from bagel_tpu.utils.quant import quantize_bagel_params

    cfg = micro_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_bagel_params(params)
    mesh = make_mesh((1, 2, 4))
    with mesh:
        sq = shard_params(mesh, qparams)
        eng = _engine(sq, cfg, tok)
        out = eng(text="abc", image_shapes=(16, 16), num_timesteps=2,
                  cfg_text_scale=2.0, cfg_img_scale=1.0, timestep_shift=1.0)
    assert out["image"].shape == (16, 16, 3)
