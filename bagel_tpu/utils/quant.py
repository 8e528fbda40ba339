"""Weight-only and weight+activation quantization for serving.

Replaces the reference's bitsandbytes NF4/INT8 path (app.py:114-131) the TPU
way: per-output-channel symmetric int8 for every large matmul weight. With
the scan-over-layers stack, weights stay int8 at rest in HBM and only the
active layer dequantizes to bf16 inside the scan step — a 14B MoT that
cannot fit one chip in bf16 (28 GB) fits in int8 (14 GB).

Quantized leaves are dicts {"w_q": int8 [in, out], "scale": f32 [out]}
consumed transparently by the models' matmul helpers.

Mode "w8a8" additionally quantizes activations dynamically (per-token
absmax) at each matmul and issues a true int8×int8→int32 `dot_general`:
the v5e MXU runs int8 at 2× the bf16 rate (measured ~235 vs ~153 TOPS on
this chip), so the compute-bound denoise path gets a genuine throughput
win on top of the memory saving — something the reference's bnb path
(dequant-to-fp16 GEMM) never does. Leaves carry "w_q8" instead of "w_q";
the embedding and lm_head stay weight-only (quality-sensitive).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> dict:
    """[in, out] (or [L, in, out]) float -> per-output-channel int8."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # over the in dim
    scale = amax / 127.0
    w_q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -127, 127)
    return {"w_q": w_q.astype(jnp.int8), "scale": jnp.squeeze(scale, -2)}


def dequantize_weight(q: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (q["w_q"].astype(jnp.float32) * q["scale"][..., None, :]).astype(dtype)


def maybe_dequantize(w, dtype=jnp.bfloat16):
    """Models call this on any weight leaf: passthrough for plain arrays."""
    if isinstance(w, dict) and "w_q" in w:
        return dequantize_weight(w, dtype)
    return w


# --------------------------------------------------------------------------
# 4-bit weight-only: symmetric int4 and NF4, both per-group along the input
# dim with two nibbles packed per byte — true 4-bit at rest (a 14B MoT drops
# to ~7 GB, the reference's bnb NF4 small-host mode, app.py:114-131).
# --------------------------------------------------------------------------

# the bitsandbytes NF4 codebook: 16 quantiles of a standard normal,
# normalized to [-1, 1] (QLoRA paper, table reproduced by value)
NF4_TABLE = jnp.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], jnp.float32)


def _pack_nibbles(idx: jax.Array) -> jax.Array:
    """uint8 values 0..15 over [..., in, out] -> [..., in/2, out] packed
    (row 2i -> low nibble, row 2i+1 -> high)."""
    lo = idx[..., 0::2, :]
    hi = idx[..., 1::2, :]
    return (lo | (hi << 4)).astype(jnp.uint8)


def _unpack_nibbles(p4: jax.Array) -> jax.Array:
    """Inverse of _pack_nibbles: [..., in/2, out] -> [..., in, out] uint8."""
    lo = p4 & jnp.uint8(15)
    hi = p4 >> jnp.uint8(4)
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    shape = p4.shape[:-2] + (p4.shape[-2] * 2, p4.shape[-1])
    return stacked.reshape(shape)


def quantize_weight_int4(w: jax.Array, group: int = 128) -> dict:
    """[in, out] (or [L, in, out]) -> symmetric int4, per-(group, column)
    scales. in % (2, group) == 0."""
    wf = w.astype(jnp.float32)
    in_ = wf.shape[-2]
    group = min(group, in_)  # small test configs: one group per column
    assert in_ % group == 0 and in_ % 2 == 0, (in_, group)
    gshape = wf.shape[:-2] + (in_ // group, group, wf.shape[-1])
    wg = wf.reshape(gshape)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wg / scale), -8, 7).reshape(wf.shape)
    idx = (q + 8).astype(jnp.uint8)
    # group is inferred at dequant from in_dim / scale rows (no python
    # leaves in the pytree)
    return {
        "w_p4": _pack_nibbles(idx),
        "scale4": jnp.squeeze(scale, -2),  # [..., in/group, out]
    }


def quantize_weight_nf4(w: jax.Array, group: int = 128) -> dict:
    """[in, out] (or stacked) -> NF4 codebook indices + per-group absmax."""
    wf = w.astype(jnp.float32)
    in_ = wf.shape[-2]
    group = min(group, in_)
    assert in_ % group == 0 and in_ % 2 == 0, (in_, group)
    gshape = wf.shape[:-2] + (in_ // group, group, wf.shape[-1])
    wg = wf.reshape(gshape)
    absmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2, keepdims=True), 1e-12)
    normed = (wg / absmax).reshape(wf.shape)
    # nearest codebook entry
    dist = jnp.abs(normed[..., None] - NF4_TABLE)
    idx = jnp.argmin(dist, axis=-1).astype(jnp.uint8)
    return {
        "w_nf4": _pack_nibbles(idx),
        "absmax": jnp.squeeze(absmax, -2),
    }


def dequantize_weight4(q: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize an int4/NF4 leaf back to [..., in, out]."""
    if "w_p4" in q:
        nib = _unpack_nibbles(q["w_p4"]).astype(jnp.int8) - 8
        w = nib.astype(jnp.float32)
        scale = q["scale4"]
    else:
        nib = _unpack_nibbles(q["w_nf4"])
        w = NF4_TABLE[nib]
        scale = q["absmax"]
    in_ = w.shape[-2]
    group = in_ // scale.shape[-2]
    gshape = w.shape[:-2] + (in_ // group, group, w.shape[-1])
    w = w.reshape(gshape) * scale[..., :, None, :]
    return w.reshape(w.shape[:-3] + (in_, w.shape[-1])).astype(dtype)


def quantize_llm_params(params: dict, mode: str = "int8") -> dict:
    """Quantize the LLM's large matmuls (attention projections, FFN,
    lm_head, embedding). Norms, biases and adapters stay as-is.

    mode: "int8" per-column, "w8a8" per-column weights + dynamic per-token
    int8 activations (int8 MXU dots), "int4" per-group symmetric, "nf4"
    per-group codebook (reference bnb parity, app.py:114-131). The lm_head
    and embedding always use weight-only int8 — output quality is most
    sensitive there and both are single tensors."""
    assert mode in ("int8", "w8a8", "int4", "nf4"), mode

    def quantize_weight_a8(w):
        q = quantize_weight(w)
        return {"w_q8": q["w_q"], "scale": q["scale"]}

    quant = {
        "int8": quantize_weight,
        "w8a8": quantize_weight_a8,
        "int4": quantize_weight_int4,
        "nf4": quantize_weight_nf4,
    }[mode]

    out = dict(params)
    layers = dict(params["layers"])

    def quant_attn(attn):
        a = dict(attn)
        for k in ("q", "k", "v", "o"):
            p = dict(a[k])
            p_q = quant(p.pop("w"))
            p.update(p_q)
            a[k] = p
        return a

    def quant_mlp(mlp):
        return {k: quant(v) for k, v in mlp.items()}

    for name in list(layers):
        if name.startswith("attn"):
            layers[name] = quant_attn(layers[name])
        elif name.startswith("mlp"):
            layers[name] = quant_mlp(layers[name])
    out["layers"] = layers
    out["lm_head"] = {**quantize_weight(params["lm_head"]["w"])}
    # embedding: per-row scales so gathers dequantize cheaply
    emb = params["embed"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(emb), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    out["embed"] = {
        "w_q": jnp.clip(jnp.round(emb / scale), -127, 127).astype(jnp.int8),
        "row_scale": scale[:, 0].astype(jnp.float32),
    }
    return out


def quantize_bagel_params(params: dict, mode: str = "int8") -> dict:
    out = dict(params)
    out["llm"] = quantize_llm_params(params["llm"], mode)
    return out
