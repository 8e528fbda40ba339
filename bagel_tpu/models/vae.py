"""FLUX-style conv VAE, TPU-native (NHWC, XLA conv fusions).

Re-implements the reference autoencoder (modeling/autoencoder.py) as pure
functions over a parameter pytree. Layout is NHWC end-to-end (TPU conv
native); the checkpoint converter transposes torch OIHW conv weights to HWIO.

Architecture (autoencoder.py:122-325): encoder = conv_in, len(ch_mult)
resolution levels of num_res_blocks ResNet blocks with stride-2 downsample
between levels (asymmetric (0,1) padding), middle block with single-head
attention, GroupNorm(32)+swish everywhere; decoder mirrors it with
num_res_blocks+1 blocks per level and nearest-neighbor 2x upsampling.
DiagonalGaussian latent sampling with fixed scale/shift factors.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from bagel_tpu.configs import VAEConfig
from bagel_tpu.ops.norms import group_norm


def swish(x):
    return x * jax.nn.sigmoid(x)


def conv2d(x, p, stride=1, padding=1, precision=None):
    """NHWC conv. padding: int (symmetric) or explicit ((t,b),(l,r))."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return (out + p["b"]).astype(x.dtype)


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * (fan_in**-0.5)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), jnp.float32)}


def _gn_init(c):
    return {"w": jnp.ones((c,), jnp.float32), "b": jnp.zeros((c,), jnp.float32)}


def _resnet_init(key, cin, cout, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin),
        "conv1": _conv_init(k1, 3, 3, cin, cout, dtype),
        "norm2": _gn_init(cout),
        "conv2": _conv_init(k2, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv_init(k3, 1, 1, cin, cout, dtype)
    return p


def _resnet_apply(x, p, precision=None):
    h = group_norm(x, p["norm1"]["w"], p["norm1"]["b"])
    h = conv2d(swish(h), p["conv1"], padding=1, precision=precision)
    h = group_norm(h, p["norm2"]["w"], p["norm2"]["b"])
    h = conv2d(swish(h), p["conv2"], padding=1, precision=precision)
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"], padding=0, precision=precision)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _gn_init(c),
        "q": _conv_init(ks[0], 1, 1, c, c, dtype),
        "k": _conv_init(ks[1], 1, 1, c, c, dtype),
        "v": _conv_init(ks[2], 1, 1, c, c, dtype),
        "proj": _conv_init(ks[3], 1, 1, c, c, dtype),
    }


def _attn_apply(x, p, precision=None):
    """Single-head full attention over the spatial grid (autoencoder.py:38-65)."""
    n, hh, ww, c = x.shape
    h = group_norm(x, p["norm"]["w"], p["norm"]["b"])
    q = conv2d(h, p["q"], padding=0, precision=precision).reshape(n, hh * ww, c)
    k = conv2d(h, p["k"], padding=0, precision=precision).reshape(n, hh * ww, c)
    v = conv2d(h, p["v"], padding=0, precision=precision).reshape(n, hh * ww, c)
    logits = jnp.einsum(
        "nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32,
        precision=precision,
    ) * (c**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    att = jnp.einsum(
        "nqk,nkc->nqc", probs, v, preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(x.dtype)
    att = att.reshape(n, hh, ww, c)
    return x + conv2d(att, p["proj"], padding=0, precision=precision)


def init_vae_params(key, cfg: VAEConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))
    ch = cfg.ch
    in_mult = (1,) + tuple(cfg.ch_mult)

    # --- encoder ---
    enc = {"conv_in": _conv_init(next(keys), 3, 3, cfg.in_channels, ch, dtype)}
    levels = []
    for i, mult in enumerate(cfg.ch_mult):
        cin, cout = ch * in_mult[i], ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resnet_init(next(keys), cin, cout, dtype))
            cin = cout
        level = {"blocks": blocks}
        if i != len(cfg.ch_mult) - 1:
            level["down"] = _conv_init(next(keys), 3, 3, cout, cout, dtype)
        levels.append(level)
    block_in = ch * cfg.ch_mult[-1]
    enc.update(
        levels=levels,
        mid={
            "block1": _resnet_init(next(keys), block_in, block_in, dtype),
            "attn": _attn_init(next(keys), block_in, dtype),
            "block2": _resnet_init(next(keys), block_in, block_in, dtype),
        },
        norm_out=_gn_init(block_in),
        conv_out=_conv_init(next(keys), 3, 3, block_in, 2 * cfg.z_channels, dtype),
    )

    # --- decoder ---
    dec = {"conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels, block_in, dtype)}
    dec["mid"] = {
        "block1": _resnet_init(next(keys), block_in, block_in, dtype),
        "attn": _attn_init(next(keys), block_in, dtype),
        "block2": _resnet_init(next(keys), block_in, block_in, dtype),
    }
    up_levels = []
    cin = block_in
    for i in reversed(range(len(cfg.ch_mult))):
        cout = ch * cfg.ch_mult[i]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resnet_init(next(keys), cin, cout, dtype))
            cin = cout
        level = {"blocks": blocks}
        if i != 0:
            level["up"] = _conv_init(next(keys), 3, 3, cout, cout, dtype)
        up_levels.insert(0, level)
    dec.update(
        up=up_levels,
        norm_out=_gn_init(cin),
        conv_out=_conv_init(next(keys), 3, 3, cin, cfg.out_ch, dtype),
    )

    return {"encoder": enc, "decoder": dec}


def vae_encode(
    params: dict,
    cfg: VAEConfig,
    images: jax.Array,  # [N, H, W, 3] in [-1, 1]
    rng: Optional[jax.Array] = None,
    sample: bool = True,
    precision=None,
) -> jax.Array:
    """Images -> scaled latents [N, H/8, W/8, z_channels].

    Matches AutoEncoder.encode (autoencoder.py:315-318): DiagonalGaussian
    sampling then scale_factor * (z - shift_factor).
    """
    enc = params["encoder"]
    h = conv2d(images, enc["conv_in"], padding=1, precision=precision)
    for i, level in enumerate(enc["levels"]):
        for block in level["blocks"]:
            h = _resnet_apply(h, block, precision)
        if "down" in level:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(h, level["down"], stride=2, padding=0, precision=precision)
    h = _resnet_apply(h, enc["mid"]["block1"], precision)
    h = _attn_apply(h, enc["mid"]["attn"], precision)
    h = _resnet_apply(h, enc["mid"]["block2"], precision)
    h = group_norm(h, enc["norm_out"]["w"], enc["norm_out"]["b"])
    h = conv2d(swish(h), enc["conv_out"], padding=1, precision=precision)

    mean, logvar = jnp.split(h, 2, axis=-1)
    if sample:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    else:
        z = mean
    return cfg.scale_factor * (z - cfg.shift_factor)


def vae_decode(
    params: dict, cfg: VAEConfig, z: jax.Array, precision=None
) -> jax.Array:
    """Scaled latents [N, h, w, z] -> images [N, 8h, 8w, 3]."""
    z = z / cfg.scale_factor + cfg.shift_factor
    dec = params["decoder"]
    h = conv2d(z, dec["conv_in"], padding=1, precision=precision)
    h = _resnet_apply(h, dec["mid"]["block1"], precision)
    h = _attn_apply(h, dec["mid"]["attn"], precision)
    h = _resnet_apply(h, dec["mid"]["block2"], precision)
    for i in reversed(range(len(dec["up"]))):
        level = dec["up"][i]
        for block in level["blocks"]:
            h = _resnet_apply(h, block, precision)
        if "up" in level:
            n, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv2d(h, level["up"], padding=1, precision=precision)
    h = group_norm(h, dec["norm_out"]["w"], dec["norm_out"]["b"])
    return conv2d(swish(h), dec["conv_out"], padding=1, precision=precision)
