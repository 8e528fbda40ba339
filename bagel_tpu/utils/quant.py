"""Weight-only int8 quantization for serving.

Replaces the reference's bitsandbytes NF4/INT8 path (app.py:114-131) the TPU
way: per-output-channel symmetric int8 for every large matmul weight. With
the scan-over-layers stack, weights stay int8 at rest in HBM and only the
active layer dequantizes to bf16 inside the scan step — a 14B MoT that
cannot fit one chip in bf16 (28 GB) fits in int8 (14 GB).

Quantized leaves are dicts {"w_q": int8 [in, out], "scale": f32 [out]}
consumed transparently by the models' matmul helpers.
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


_LLM_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llm_params(params: dict) -> dict:
    """Quantize the LLM's large matmuls (attention projections, FFN,
    lm_head, embedding). Norms, biases and adapters stay as-is."""
    import copy

    out = dict(params)
    layers = dict(params["layers"])

    def quant_attn(attn):
        a = dict(attn)
        for k in ("q", "k", "v", "o"):
            p = dict(a[k])
            p_q = quantize_weight(p.pop("w"))
            p.update(p_q)
            a[k] = p
        return a

    def quant_mlp(mlp):
        return {k: quantize_weight(v) for k, v in mlp.items()}

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


def quantize_bagel_params(params: dict) -> dict:
    out = dict(params)
    out["llm"] = quantize_llm_params(params["llm"])
    return out
