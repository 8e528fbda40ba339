"""End-to-end engine smoke tests on a tiny model (CPU, fp32).

Covers the five reference modes (inferencer.py:207-313): understand,
generate, edit, think-understand, think-generate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.data.tokenizer import MockTokenizer
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.models.bagel import (
    cfg_combine,
    init_bagel_params,
    patchify_latent,
    shifted_timesteps,
    unpatchify_latent,
)


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_bagel()
    tok = MockTokenizer(vocab_size=cfg.llm.vocab_size)
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return BagelEngine(params, cfg, tok, tok.new_token_ids, max_kv=1024)


def test_understand_flow(engine):
    img = np.random.default_rng(0).standard_normal((28, 28, 3)).astype(np.float32) * 0.3
    out = engine(image=img, text="what is this?", understanding_output=True,
                 max_think_token_n=8)
    assert isinstance(out["text"], str) and len(out["text"]) > 0
    assert out["image"] is None


def test_t2i_flow(engine):
    out = engine(
        text="a red square", understanding_output=False,
        image_shapes=(32, 32), num_timesteps=4, cfg_text_scale=2.0,
        cfg_img_scale=1.0, timestep_shift=1.0,
    )
    img = out["image"]
    assert img is not None and img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_edit_flow(engine):
    src = np.random.default_rng(1).standard_normal((32, 32, 3)).astype(np.float32) * 0.3
    out = engine(
        image=src, text="make it blue", understanding_output=False,
        num_timesteps=3, cfg_text_scale=2.0, cfg_img_scale=1.5,
        timestep_shift=1.0,
    )
    assert out["image"].shape == (32, 32, 3)


def test_think_generate_flow(engine):
    out = engine(
        text="draw a cat", think=True, understanding_output=False,
        image_shapes=(32, 32), num_timesteps=2, max_think_token_n=6,
        cfg_text_scale=1.5, cfg_img_scale=1.0, timestep_shift=1.0,
    )
    assert out["text"] is not None and out["image"] is not None


def test_timestep_schedule_matches_reference_formula():
    ts, dts = shifted_timesteps(5, 3.0)
    t = np.linspace(1, 0, 5)
    t = 3.0 * t / (1 + 2.0 * t)
    np.testing.assert_allclose(np.asarray(ts), t[:-1], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dts), t[:-1] - t[1:], rtol=1e-6)
    # integrating x -= v*dt with v=x1-x0 from pure noise recovers x0 exactly
    # for a linear field: x_t = x0 + t*(x1-x0)
    x0, x1 = 3.0, -2.0
    x = x1  # t=1 start  (noise)
    for i in range(len(np.asarray(ts))):
        x = x - (x1 - x0) * float(dts[i])
    # after the last step we are at t=timesteps[-1] - dts[-1] = 0
    np.testing.assert_allclose(x, x0, rtol=1e-5)


def test_cfg_combine_math():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    vt = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))

    # scale 1.0 -> unguided
    np.testing.assert_array_equal(np.asarray(cfg_combine(v, vt, vi, 1.0, 1.0)), np.asarray(v))

    # global renorm: norm never exceeds the cond field's norm
    out = cfg_combine(v, vt, None, 4.0, 1.0, "global", 0.0)
    assert float(jnp.linalg.norm(out)) <= float(jnp.linalg.norm(v)) + 1e-4
    # direction matches unrenormalized combination
    raw = vt + 4.0 * (v - vt)
    cos = jnp.sum(out * raw) / (jnp.linalg.norm(out) * jnp.linalg.norm(raw))
    assert float(cos) > 0.9999

    # channel renorm: per-token norms bounded by cond per-token norms
    out = cfg_combine(v, vt, None, 4.0, 1.0, "channel", 0.0)
    assert bool(
        jnp.all(
            jnp.linalg.norm(out, axis=-1)
            <= jnp.linalg.norm(v, axis=-1) + 1e-4
        )
    )

    # text_channel with img cfg applies img guidance after renorm
    out = cfg_combine(v, vt, vi, 4.0, 2.0, "text_channel", 0.0)
    vtx = vt + 4.0 * (v - vt)
    scale = jnp.clip(
        jnp.linalg.norm(v, axis=-1, keepdims=True)
        / (jnp.linalg.norm(vtx, axis=-1, keepdims=True) + 1e-8),
        0.0, 1.0,
    )
    expected = vi + 2.0 * (vtx * scale - vi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_latent_patchify_roundtrip():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((8, 12, 4)).astype(np.float32))
    p = patchify_latent(z, 2)
    assert p.shape == (4 * 6, 2 * 2 * 4)
    back = unpatchify_latent(p, 4, 6, 2, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z))


def test_latent_patchify_matches_reference():
    """Ordering parity with bagel.py:184-188 (chpwq->hwpqc)."""
    import torch
    import refutil  # noqa: F401

    rng = np.random.default_rng(1)
    z_chw = rng.standard_normal((4, 8, 12)).astype(np.float32)  # [C, H, W]
    p = 2
    c, hp, wp = z_chw.shape
    h, w = hp // p, wp // p
    lat = torch.from_numpy(z_chw).reshape(c, h, p, w, p)
    expected = torch.einsum("chpwq->hwpqc", lat).reshape(-1, p * p * c).numpy()

    got = np.asarray(patchify_latent(jnp.asarray(z_chw.transpose(1, 2, 0)), p))
    np.testing.assert_array_equal(got, expected)
