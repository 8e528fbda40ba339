"""SigLIP NaViT vision tower, TPU-native.

Packed variable-resolution ViT (reference modeling/bagel/siglip_navit.py):
images are patchified host-side into one flat token buffer; full attention is
restricted to each image via segment ids (replacing flash_attn_varlen's
cu_seqlens, siglip_navit.py:232-241). The conv patch embed is a Linear over
flattened 14x14x3 patches (the reference converts conv->linear at load,
:167-182; we are linear-native and the checkpoint converter does the weight
reshape). 2-D axial RoPE over the patch grid (:102-142) or a learned
position table (:164-165,191-192).

Attention: at packed lengths worth tiling (>=1024 tokens on TPU) the tower
runs the block-sparse Pallas flash kernel — the segment predicate is the
document predicate of ops/sparse_flash with fan_id = segment_ids, so
same-image full attention falls out of the train-mask kernel with zero new
kernel code, dead cross-image tiles skip DMA+MXU, and the O(N^2) packed
segment mask (the reference's flash_attn_varlen site,
siglip_navit.py:232-241) is never materialized. Small inputs keep the dense
XLA path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from bagel_tpu.configs import SiglipConfig
from bagel_tpu.ops.attention import dot_attention, segment_mask
from bagel_tpu.ops.norms import layer_norm
from bagel_tpu.ops.rope import apply_rope_2d, rope_2d_tables

_FLASH_MIN_TOKENS = 1024
_FLASH_BLOCK = 256


def segment_flash_attention(
    q: jax.Array,  # [N, H, D]
    k: jax.Array,
    v: jax.Array,
    segment_ids: jax.Array,  # [N] int32, 0 = padding
    interpret: bool = False,
) -> jax.Array:
    """Same-segment full attention via the block-sparse train kernel.

    sparse_packed_attention's mask is
    `same_doc & (causal | same_fan) & remove_noise`; passing
    document_id = fan_id = segment_ids and noise_id = -1 reduces it to
    exactly `same_segment & segment != 0` — per-image full attention.
    Padded rows (segment 0) return zeros. Differentiable (custom VJP with
    chunked recompute), so the packed training forward uses it too."""
    from bagel_tpu.ops.sparse_flash import sparse_packed_attention

    n = q.shape[0]
    npad = -(-n // _FLASH_BLOCK) * _FLASH_BLOCK
    pad = npad - n
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        segment_ids = jnp.pad(segment_ids, (0, pad))
    out = sparse_packed_attention(
        q, k, v, segment_ids.astype(jnp.int32),
        segment_ids.astype(jnp.int32),
        jnp.full((npad,), -1, jnp.int32),
        block_q=_FLASH_BLOCK, block_k=_FLASH_BLOCK, interpret=interpret,
    )
    return out[:n] if pad else out


def _dense(key, d_in, d_out, dtype, std=0.02):
    return {
        "w": (jax.random.normal(key, (d_in, d_out), jnp.float32) * std).astype(dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def _linear(x, p, precision=None):
    out = jnp.dot(x, p["w"], preferred_element_type=jnp.float32,
                  precision=precision)
    return (out + p["b"].astype(jnp.float32)).astype(x.dtype)


def init_siglip_params(key, cfg: SiglipConfig, dtype=jnp.bfloat16) -> dict:
    L, d, f = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(key, 8)

    def stacked(key, d_in, d_out):
        ks = jax.random.split(key, L)
        return jax.vmap(lambda k: _dense(k, d_in, d_out, dtype))(ks)

    def ln_stack():
        return {"w": jnp.ones((L, d), jnp.float32), "b": jnp.zeros((L, d), jnp.float32)}

    params = {
        "patch_embed": _dense(keys[0], cfg.patch_dim, d, dtype),
        "layers": {
            "ln1": ln_stack(),
            "ln2": ln_stack(),
            "attn": {
                "q": stacked(keys[1], d, d),
                "k": stacked(keys[2], d, d),
                "v": stacked(keys[3], d, d),
                "o": stacked(keys[4], d, d),
            },
            "mlp": {
                "fc1": stacked(keys[5], d, f),
                "fc2": stacked(keys[6], f, d),
            },
        },
        "post_ln": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
    }
    if not cfg.rope:
        params["pos_embed"] = (
            jax.random.normal(keys[7], (cfg.num_patches_per_side**2, d), jnp.float32)
            * 0.02
        ).astype(dtype)
    return params


def siglip_encode(
    params: dict,
    cfg: SiglipConfig,
    packed_patches: jax.Array,  # [N, patch_dim] flattened pixel patches
    position_ids: jax.Array,  # [N] flattened grid position per token
    segment_ids: jax.Array,  # [N] image index (1-based), 0 = padding
    precision=None,
    attn_impl: str = "auto",
) -> jax.Array:
    """Encode a packed batch of variable-resolution images -> [N, hidden].

    Mirrors SiglipVisionTransformer.forward (siglip_navit.py:345-371) with
    segment-restricted attention instead of varlen cu_seqlens: the Pallas
    block-sparse flash kernel at packed lengths worth tiling, a dense
    segment mask otherwise (attn_impl: auto | flash | dense).
    """
    n = packed_patches.shape[0]
    h = cfg.num_attention_heads
    hd = cfg.head_dim
    eps = cfg.layer_norm_eps

    x = _linear(packed_patches, params["patch_embed"], precision)
    if not cfg.rope:
        x = x + params["pos_embed"][position_ids].astype(x.dtype)

    if cfg.rope:
        side = cfg.num_patches_per_side
        cos_h, sin_h, cos_w, sin_w = rope_2d_tables(hd // 2, side, side)
        rope_tabs = tuple(t[position_ids] for t in (cos_h, sin_h, cos_w, sin_w))
    else:
        rope_tabs = None

    use_flash = attn_impl == "flash" or (
        attn_impl == "auto"
        and jax.default_backend() == "tpu"
        and n >= _FLASH_MIN_TOKENS
    )
    mask = None if use_flash else segment_mask(segment_ids[None])  # [1, N, N]

    def body(x, lp):
        res = x
        y = layer_norm(x, lp["ln1"]["w"], lp["ln1"]["b"], eps)
        q = _linear(y, lp["attn"]["q"], precision).reshape(n, h, hd)
        k = _linear(y, lp["attn"]["k"], precision).reshape(n, h, hd)
        v = _linear(y, lp["attn"]["v"], precision).reshape(n, h, hd)
        if rope_tabs is not None:
            q, k = apply_rope_2d(q, k, *rope_tabs)
            q = q.astype(v.dtype)
            k = k.astype(v.dtype)
        if use_flash:
            att = segment_flash_attention(
                q, k, v, segment_ids,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            att = dot_attention(
                q[None], k[None], v[None], mask=mask, precision=precision
            )[0]
        x = res + _linear(att.reshape(n, h * hd), lp["attn"]["o"], precision)

        res = x
        y = layer_norm(x, lp["ln2"]["w"], lp["ln2"]["b"], eps)
        y = _linear(y, lp["mlp"]["fc1"], precision)
        y = jax.nn.gelu(y, approximate=True)
        y = _linear(y, lp["mlp"]["fc2"], precision)
        return res + y, None

    x, _ = lax.scan(body, x, params["layers"])
    return layer_norm(x, params["post_ln"]["w"], params["post_ln"]["b"], eps)
