"""FLUX VAE: golden parity vs the torch reference autoencoder (CPU)."""

import numpy as np
import pytest
import torch

import refutil  # noqa: F401

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_vae
from bagel_tpu.models.vae import init_vae_params, vae_decode, vae_encode

PREC = "float32"


@pytest.fixture(scope="module")
def setup():
    from modeling.autoencoder import AutoEncoder, AutoEncoderParams

    cfg = tiny_vae()
    ref_params = AutoEncoderParams(
        resolution=cfg.resolution,
        in_channels=cfg.in_channels,
        downsample=cfg.downsample,
        ch=cfg.ch,
        out_ch=cfg.out_ch,
        ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks,
        z_channels=cfg.z_channels,
        scale_factor=cfg.scale_factor,
        shift_factor=cfg.shift_factor,
    )
    torch.manual_seed(0)
    model = AutoEncoder(ref_params).eval()
    return cfg, model


def _cv(w):
    """torch conv OIHW -> HWIO."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _conv(mod):
    return {"w": _cv(mod.weight), "b": jnp.asarray(mod.bias.detach().numpy())}


def _gn(mod):
    return {
        "w": jnp.asarray(mod.weight.detach().numpy()),
        "b": jnp.asarray(mod.bias.detach().numpy()),
    }


def _res(mod):
    p = {
        "norm1": _gn(mod.norm1), "conv1": _conv(mod.conv1),
        "norm2": _gn(mod.norm2), "conv2": _conv(mod.conv2),
    }
    if hasattr(mod, "nin_shortcut"):
        p["shortcut"] = _conv(mod.nin_shortcut)
    return p


def _attn(mod):
    return {
        "norm": _gn(mod.norm),
        "q": _conv(mod.q), "k": _conv(mod.k), "v": _conv(mod.v),
        "proj": _conv(mod.proj_out),
    }


def _convert(model, cfg):
    enc, dec = model.encoder, model.decoder
    enc_p = {
        "conv_in": _conv(enc.conv_in),
        "levels": [
            {
                "blocks": [_res(b) for b in lvl.block],
                **({"down": _conv(lvl.downsample.conv)} if hasattr(lvl, "downsample") else {}),
            }
            for lvl in enc.down
        ],
        "mid": {
            "block1": _res(enc.mid.block_1),
            "attn": _attn(enc.mid.attn_1),
            "block2": _res(enc.mid.block_2),
        },
        "norm_out": _gn(enc.norm_out),
        "conv_out": _conv(enc.conv_out),
    }
    dec_p = {
        "conv_in": _conv(dec.conv_in),
        "mid": {
            "block1": _res(dec.mid.block_1),
            "attn": _attn(dec.mid.attn_1),
            "block2": _res(dec.mid.block_2),
        },
        "up": [
            {
                "blocks": [_res(b) for b in lvl.block],
                **({"up": _conv(lvl.upsample.conv)} if hasattr(lvl, "upsample") else {}),
            }
            for lvl in dec.up
        ],
        "norm_out": _gn(dec.norm_out),
        "conv_out": _conv(dec.conv_out),
    }
    return {"encoder": enc_p, "decoder": dec_p}


def test_vae_encode_matches_reference(setup, rng):
    cfg, model = setup
    params = _convert(model, cfg)
    x = rng.standard_normal((2, 3, 32, 48)).astype(np.float32) * 0.5

    with torch.no_grad():
        # deterministic: take the mean (no sampling noise)
        model.reg.sample = False
        expected = model.encode(torch.from_numpy(x)).numpy()

    got = vae_encode(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
        sample=False, precision=PREC,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_vae_decode_matches_reference(setup, rng):
    cfg, model = setup
    params = _convert(model, cfg)
    down = cfg.downsample
    z = rng.standard_normal((1, cfg.z_channels, 8, 12)).astype(np.float32)

    with torch.no_grad():
        expected = model.decode(torch.from_numpy(z)).numpy()

    got = vae_decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 1)), precision=PREC)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_vae_roundtrip_sampled(setup, rng):
    """Sampled encode + decode runs and produces finite output of the right
    shape (stochastic path)."""
    cfg, model = setup
    params = _convert(model, cfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    z = vae_encode(params, cfg, x, rng=jax.random.PRNGKey(3), sample=True)
    assert z.shape == (1, 16, 16, cfg.z_channels)
    out = vae_decode(params, cfg, z)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
