"""Qwen2 Mixture-of-Transformer-experts (MoT) decoder, TPU-native.

Re-design of the reference's packed NaViT Qwen2 (qwen2_navit.py:236-1188):

- All state is a pytree of stacked per-layer weights; the 28-layer stack runs
  under one `lax.scan` (fast compile, uniform GSPMD sharding).
- The reference's scatter-merged flat KV cache + Python index lists
  (qwen2_navit.py:341-370, 559-574) become a preallocated append-only buffer
  `[layers, B, max_len, kv_heads, head_dim]` with a per-row length counter.
  Correctness note: later blocks always see earlier cache entries as fully
  visible (causality only constrains *within* a new block), so KV write order
  inside a past block never affects results — which licenses the layout
  change below.
- MoT expert selection is deterministic by token modality. At inference the
  und (text/ViT) tokens and gen (VAE latent) tokens of a block are kept in
  *separate contiguous slices* `[0:und_len) / [und_len:T)` so each expert
  runs only its own matmuls — no gathers, no 2x dense waste (the reference
  scatters through index_put_, qwen2_navit.py:522-548). Slice order is
  irrelevant to attention because gen blocks are non-causal and every token
  of an image shares one RoPE position id (bagel.py:592).
- Training uses the dense dual-expert + select formulation over the packed
  sequence (both experts on all tokens, `where` by modality mask): exact
  semantics, MXU-friendly; a grouped-matmul Pallas kernel can replace it
  later if the 2x projection FLOPs ever dominate.

Three layer variants map to the reference registry (qwen2_navit.py:936-940):
layer_module = "dense" | "moe" (shared attn, dual FFN) | "mot" (dual attn
projections/norms + dual FFN, shared attention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from bagel_tpu.configs import Qwen2Config
from bagel_tpu.ops.attention import cache_block_mask, dot_attention
from bagel_tpu.ops.flash import flash_cached_attention
from bagel_tpu.ops.norms import rms_norm
from bagel_tpu.ops.rope import apply_rope, rope_cos_sin


def _flash_eligible(t: int, s: int, d: int) -> bool:
    """The Pallas kernel needs MXU-aligned cache/head shapes and a TPU
    backend; everything else (decode T=1, CPU tests) takes the XLA path.
    T may be ragged — the kernel pads the query block internally (exact
    gen blocks, e.g. 4098 at 1024px, must NOT fall through to the dense
    XLA path: its [B,H,G,T,S] fp32 logits are ~11 GB at denoise shapes)."""
    return (
        jax.default_backend() == "tpu"
        and d % 128 == 0
        and s % 128 == 0
        and t >= 128
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Append-only KV buffer. k/v: [L, B, S_max, KH, D]; length: [B] int32.

    Quantized variant (kv_cache_init with dtype=int8): k/v hold int8 codes
    and k_scale/v_scale hold per-(token, head) float32 scales
    [L, B, S_max, KH] — half the KV bytes at rest, which is what bounds a
    continuous-batching server's slot count on a 16 GB chip (the reference
    has no KV quantization; its NaiveCache is bf16 torch tensors,
    qwen2_navit.py:207-233)."""

    k: jax.Array
    v: jax.Array
    length: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def kv_cache_init(
    cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    scales = None
    if dtype == jnp.int8:
        scales = jnp.zeros(shape[:-1], jnp.float32)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((batch,), jnp.int32),
        k_scale=scales,
        v_scale=None if scales is None else jnp.zeros_like(scales),
    )


def _kv_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8: [..., D] -> (codes, scales[...])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _kv_dequantize(buf: jax.Array, sbuf: jax.Array, dtype) -> jax.Array:
    return (buf.astype(jnp.float32) * sbuf[..., None]).astype(dtype)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _dense(key, d_in, d_out, dtype, bias: bool, std=0.02):
    wkey, _ = jax.random.split(key)
    p = {"w": (jax.random.normal(wkey, (d_in, d_out), jnp.float32) * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _linear(x, p, precision=None):
    """Matmul over a weight leaf: {'w': ...[, 'b']}, a bare array, or an
    int8 weight-only dict {'w_q', 'scale'[, 'b']} (utils/quant.py) which
    dequantizes to x.dtype at use — int8 at rest, one layer live at a time
    under the scan. A 'w_q8' leaf (mode w8a8) instead quantizes the
    activations per token and runs a true int8×int8→int32 dot on the MXU
    (2× the bf16 matmul rate on v5e)."""
    if not isinstance(p, dict):
        p = {"w": p}
    if "w_q8" in p:
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, p["w_q8"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * xs * p["scale"]
        if "b" in p:
            out = out + p["b"].astype(jnp.float32)
        return out.astype(x.dtype)
    if "w_q" in p:
        w = (
            p["w_q"].astype(jnp.float32) * p["scale"][..., None, :]
        ).astype(x.dtype)
    elif "w_p4" in p or "w_nf4" in p:
        if "w_p4" in p:
            from bagel_tpu.ops.int4_matmul import (
                int4_gemv_eligible,
                int4_matmul,
            )

            lead = x.shape[:-1]
            rows = 1
            for s in lead:
                rows *= s
            if int4_gemv_eligible(rows, p):
                # bandwidth-bound decode: stream packed nibbles through the
                # fused Pallas kernel instead of materializing the
                # dequantized weight in HBM
                out = int4_matmul(
                    x.reshape(rows, x.shape[-1]), p["w_p4"], p["scale4"]
                ).reshape(lead + (p["w_p4"].shape[-1],)).astype(jnp.float32)
                if "b" in p:
                    out = out + p["b"].astype(jnp.float32)
                return out.astype(x.dtype)
        from bagel_tpu.utils.quant import dequantize_weight4

        w = dequantize_weight4(p, x.dtype)
    else:
        w = p["w"]
    out = jnp.dot(x, w, preferred_element_type=jnp.float32,
                  precision=precision)
    if "b" in p:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def init_qwen2_params(
    key: jax.Array, cfg: Qwen2Config, dtype=jnp.bfloat16
) -> dict:
    """Random-init parameter pytree. Per-layer weights are stacked on axis 0.

    Gen-expert weights start as copies of und weights, mirroring init_moe
    (qwen2_navit.py:1107-1111).
    """
    L = cfg.num_hidden_layers
    d = cfg.hidden_size
    hd = cfg.head_dim
    qd = cfg.num_attention_heads * hd
    kvd = cfg.num_key_value_heads * hd
    f = cfg.intermediate_size
    keys = jax.random.split(key, 16)

    def stacked(key, d_in, d_out, bias):
        ks = jax.random.split(key, L)
        return jax.vmap(lambda k: _dense(k, d_in, d_out, dtype, bias))(ks)

    attn = {
        "q": stacked(keys[0], d, qd, True),
        "k": stacked(keys[1], d, kvd, True),
        "v": stacked(keys[2], d, kvd, True),
        "o": stacked(keys[3], qd, d, False),
    }
    if cfg.qk_norm:
        attn["q_norm"] = jnp.ones((L, hd), jnp.float32)
        attn["k_norm"] = jnp.ones((L, hd), jnp.float32)
    mlp = {
        "gate": stacked(keys[4], d, f, False)["w"],
        "up": stacked(keys[5], d, f, False)["w"],
        "down": stacked(keys[6], f, d, False)["w"],
    }
    layers = {
        "attn": attn,
        "mlp": mlp,
        "input_ln": jnp.ones((L, d), jnp.float32),
        "post_ln": jnp.ones((L, d), jnp.float32),
    }
    if cfg.layer_module == "mot":
        gen_attn = jax.tree.map(lambda x: x, attn)  # copy of und weights
        layers["attn_gen"] = gen_attn
    if cfg.use_moe:
        layers["mlp_gen"] = jax.tree.map(lambda x: x, mlp)
    if cfg.layer_module == "mot":
        layers["input_ln_gen"] = jnp.ones((L, d), jnp.float32)
        layers["post_ln_gen"] = jnp.ones((L, d), jnp.float32)

    params = {
        "embed": (
            jax.random.normal(keys[7], (cfg.vocab_size, d), jnp.float32) * 0.02
        ).astype(dtype),
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": _dense(keys[8], d, cfg.vocab_size, dtype, False),
    }
    if cfg.use_moe:
        params["final_norm_gen"] = jnp.ones((d,), jnp.float32)
    return params


# ---------------------------------------------------------------------------
# Fused projections: one [d, qd+2*kvd] QKV matmul and one [d, 2f] gate-up
# matmul per expert instead of 3+2 — one weight fetch pipeline, one dispatch
# and (in w8a8) ONE activation quantization per group. Fusion is a post-load
# pytree transform so checkpoints/converters keep the canonical per-leaf
# layout; every weight/scale/bias leaf has the output dim last, so it
# commutes with all quantization modes.
# ---------------------------------------------------------------------------


def _concat_leaves(leaves: list) -> dict:
    """Concat matching weight-dict leaves along the output (last) axis."""
    keys = set(leaves[0])
    assert all(set(p) == keys for p in leaves), "heterogeneous leaves"
    return {k: jnp.concatenate([p[k] for p in leaves], axis=-1) for k in keys}


def fuse_llm_params(params: dict, inplace: bool = False) -> dict:
    """Return params with per-attn 'qkv' and per-mlp 'gate_up' fused leaves
    (originals dropped). Idempotent; leaves bare norms/lm_head untouched.

    inplace=True mutates the given dicts so each group's unfused leaves are
    freed as soon as its fused leaf exists — peak memory is one extra
    group, not a whole second tree (a full-depth int8 MoT + its fused copy
    would not fit one 16 GB chip). Callers that keep references to the
    original tree must use inplace=False."""
    out = params if inplace else dict(params)
    layers = params["layers"] if inplace else dict(params["layers"])
    for name in list(layers):
        if name.startswith("attn"):
            a = layers[name] if inplace else dict(layers[name])
            if "qkv" not in a:
                q, k, v = a.pop("q"), a.pop("k"), a.pop("v")
                a["qkv"] = _concat_leaves([q, k, v])
                del q, k, v
            layers[name] = a
        elif name.startswith("mlp"):
            m = layers[name] if inplace else dict(layers[name])
            if "gate_up" not in m:
                gate = m.pop("gate")
                up = m.pop("up")
                if not isinstance(gate, dict):
                    gate, up = {"w": gate}, {"w": up}
                m["gate_up"] = _concat_leaves([gate, up])
                del gate, up
            layers[name] = m
    out["layers"] = layers
    return out


def _proj_qkv(x, attn, h, kh, hd, precision=None):
    """(q, k, v) heads from either fused or separate projection leaves.
    Works for any leading shape ([B, T, d] extend or [S, d] train)."""
    lead = x.shape[:-1]
    if "qkv" in attn:
        qkv = _linear(x, attn["qkv"], precision)
        q, k, v = jnp.split(qkv, [h * hd, (h + kh) * hd], axis=-1)
    else:
        q = _linear(x, attn["q"], precision)
        k = _linear(x, attn["k"], precision)
        v = _linear(x, attn["v"], precision)
    return (q.reshape(lead + (h, hd)), k.reshape(lead + (kh, hd)),
            v.reshape(lead + (kh, hd)))


def _ffn_mix(z, mlp, precision=None):
    """silu(gate) * up from fused or separate gate/up leaves."""
    if "gate_up" in mlp:
        gu = _linear(z, mlp["gate_up"], precision)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = _linear(z, mlp["gate"], precision)
        up = _linear(z, mlp["up"], precision)
    return jax.nn.silu(gate) * up


# ---------------------------------------------------------------------------
# Layer forward (inference, block-extend over KV cache)
# ---------------------------------------------------------------------------


def _split_apply(x, und_len: int, fn_und, fn_gen):
    """Apply fn_und to x[:, :und_len], fn_gen to the rest; concat results.

    und_len is a static python int, so the slices are static shapes; when the
    block is single-expert (und_len == 0 or T) only one matmul is emitted.
    """
    t = x.shape[1]
    if und_len >= t:
        return fn_und(x)
    if und_len <= 0:
        return fn_gen(x)
    a = fn_und(x[:, :und_len])
    b = fn_gen(x[:, und_len:])
    return jnp.concatenate([a, b], axis=1)


def _layer_extend(
    cfg: Qwen2Config,
    und_len: int,
    causal: bool,
    x: jax.Array,  # [B, T, d]
    lp: dict,  # one layer's params
    k_buf: jax.Array,  # [B, S, KH, D]
    v_buf: jax.Array,
    ks_buf: Optional[jax.Array],  # [B, S, KH] scales when k_buf is int8
    vs_buf: Optional[jax.Array],
    past_len: jax.Array,  # [B]
    q_valid: jax.Array,  # [B]
    cos: jax.Array,  # [B, T, D]
    sin: jax.Array,
    precision=None,
    attn_impl: str = "auto",
):
    """One decoder layer over a new token block. Returns
    (x, k_buf, v_buf, ks_buf, vs_buf) with the new block's K/V written at
    [past_len, past_len+T). int8 buffers (ks_buf/vs_buf given) are written
    quantized and dequantized around the attention — the block's own K/V
    also go through the codes, so a token sees the same cache values at
    its own step as every later step does."""
    b, t, d = x.shape
    h = cfg.num_attention_heads
    kh = cfg.num_key_value_heads
    hd = cfg.head_dim
    mot = cfg.layer_module == "mot"

    attn_u = lp["attn"]
    attn_g = lp["attn_gen"] if mot else lp["attn"]
    ln_u = lp["input_ln"]
    ln_g = lp["input_ln_gen"] if mot else lp["input_ln"]

    res = x
    hqkv = _split_apply(
        x, und_len,
        lambda xu: rms_norm(xu, ln_u, cfg.rms_norm_eps),
        lambda xg: rms_norm(xg, ln_g, cfg.rms_norm_eps),
    )

    # one fused (or three separate) projection call per expert slice; the
    # slice layout means each expert's matmuls run only on its own tokens
    def qkv_of(attn, xx):
        return _proj_qkv(xx, attn, h, kh, hd, precision)

    if und_len >= t:
        q, k, v = qkv_of(attn_u, hqkv)
    elif und_len <= 0:
        q, k, v = qkv_of(attn_g, hqkv)
    else:
        qu, ku, vu = qkv_of(attn_u, hqkv[:, :und_len])
        qg, kg, vg = qkv_of(attn_g, hqkv[:, und_len:])
        q = jnp.concatenate([qu, qg], axis=1)
        k = jnp.concatenate([ku, kg], axis=1)
        v = jnp.concatenate([vu, vg], axis=1)

    if cfg.qk_norm:
        # fp32 QK-norm (reference keeps this in fp32 on the gen path,
        # qwen2_navit.py:542-548)
        def qknorm(z, w):
            return rms_norm(z.astype(jnp.float32), w, cfg.rms_norm_eps)

        q = _split_apply(
            q, und_len,
            lambda z: qknorm(z, attn_u["q_norm"]),
            lambda z: qknorm(z, attn_g["q_norm"]),
        )
        k = _split_apply(
            k, und_len,
            lambda z: qknorm(z, attn_u["k_norm"]),
            lambda z: qknorm(z, attn_g["k_norm"]),
        )

    q, k = apply_rope(q, k, cos, sin)
    quant = k_buf.dtype == jnp.int8
    cdt = jnp.bfloat16 if quant else k_buf.dtype
    q = q.astype(cdt)

    # append block K/V at per-row offsets
    def write(buf, new, off):
        return lax.dynamic_update_slice(buf, new, (off, 0, 0))

    def write_s(buf, new, off):
        return lax.dynamic_update_slice(buf, new, (off, 0))

    if quant:
        kq, ks = _kv_quantize(k)
        vq, vs = _kv_quantize(v)
        k_buf = jax.vmap(write)(k_buf, kq, past_len)
        v_buf = jax.vmap(write)(v_buf, vq, past_len)
        ks_buf = jax.vmap(write_s)(ks_buf, ks, past_len)
        vs_buf = jax.vmap(write_s)(vs_buf, vs, past_len)
        # dequantized views feed the attention; XLA fuses the int8 load +
        # scale multiply into the consumer, so HBM traffic stays at the
        # int8 byte count on the XLA path (decode). The Pallas prefill
        # path materializes the bf16 view once per layer — prefill is
        # compute-bound, so that's in the noise.
        k_use = _kv_dequantize(k_buf, ks_buf, cdt)
        v_use = _kv_dequantize(v_buf, vs_buf, cdt)
    else:
        k_buf = jax.vmap(write)(k_buf, k.astype(cdt), past_len)
        v_buf = jax.vmap(write)(v_buf, v.astype(v_buf.dtype), past_len)
        k_use, v_use = k_buf, v_buf

    if attn_impl == "flash" or (
        attn_impl == "auto" and _flash_eligible(t, k_buf.shape[1], hd)
    ):
        att = flash_cached_attention(
            q, k_use, v_use, past_len, q_valid, causal=causal
        )
    else:
        mask = cache_block_mask(k_buf.shape[1], t, past_len, q_valid, causal)
        att = dot_attention(q, k_use, v_use, mask=mask, precision=precision)
    att = att.reshape(b, t, h * hd)

    o = _split_apply(
        att, und_len,
        lambda z: _linear(z, attn_u["o"], precision),
        lambda z: _linear(z, attn_g["o"], precision),
    )
    x = res + o.astype(res.dtype)

    # FFN
    res = x
    mlp_u = lp["mlp"]
    mlp_g = lp.get("mlp_gen", lp["mlp"])
    pln_u = lp["post_ln"]
    pln_g = lp["post_ln_gen"] if mot else lp["post_ln"]

    def ffn(mlp, pln):
        def f(z):
            z = rms_norm(z, pln, cfg.rms_norm_eps)
            return _linear(_ffn_mix(z, mlp, precision), mlp["down"], precision)

        return f

    m = _split_apply(x, und_len, ffn(mlp_u, pln_u), ffn(mlp_g, pln_g))
    x = res + m.astype(res.dtype)
    return x, k_buf, v_buf, ks_buf, vs_buf


def llm_extend(
    params: dict,
    cfg: Qwen2Config,
    embeds: jax.Array,  # [B, T, d] input embeddings for the new block
    position_ids: jax.Array,  # [B, T] rope positions
    cache: KVCache,
    q_valid: jax.Array,  # [B] valid tokens in the block
    *,
    und_len: int,  # tokens [0:und_len) use the und expert, rest the gen expert
    causal: bool,
    update_cache: bool,
    precision=None,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, KVCache]:
    """Run the full decoder stack over one new block of tokens.

    Subsumes the reference's forward_inference paths for text prefill
    (und, causal — bagel.py:267-297), ViT blocks (und, full — :362-415),
    VAE blocks (gen, full — :491-550), flow steps (gen, full, no cache
    update — :757-833) and decode (und, causal, T=1 — :930-1000).

    Returns final hidden states [B, T, d] (post final-norm, expert-selected)
    and the updated cache (identical to input if update_cache=False).
    """
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    layer_fn = partial(
        _layer_extend, cfg, und_len, causal,
        precision=precision, attn_impl=attn_impl,
    )

    def body(carry, xs):
        x = carry
        lp, k_buf, v_buf, ks_buf, vs_buf = xs
        x, k_buf, v_buf, ks_buf, vs_buf = layer_fn(
            x, lp, k_buf, v_buf, ks_buf, vs_buf, cache.length, q_valid,
            cos, sin
        )
        return x, (k_buf, v_buf, ks_buf, vs_buf)

    # None scale buffers are empty pytrees: scan carries them through as-is
    x, (k_new, v_new, ks_new, vs_new) = lax.scan(
        body, embeds,
        (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale),
    )

    fin_u = params["final_norm"]
    fin_g = params.get("final_norm_gen", fin_u)
    x = _split_apply(
        x, und_len,
        lambda z: rms_norm(z, fin_u, cfg.rms_norm_eps),
        lambda z: rms_norm(z, fin_g, cfg.rms_norm_eps),
    )

    if update_cache:
        new_cache = KVCache(
            k=k_new, v=v_new, length=cache.length + q_valid,
            k_scale=ks_new, v_scale=vs_new,
        )
    else:
        new_cache = cache
    return x, new_cache


def embed_tokens(params: dict, ids: jax.Array) -> jax.Array:
    emb = params["embed"]
    if isinstance(emb, dict):  # int8 rows with per-row scales
        rows = emb["w_q"][ids].astype(jnp.float32)
        return (rows * emb["row_scale"][ids][..., None]).astype(jnp.bfloat16)
    return emb[ids]


def lm_logits(params: dict, hidden: jax.Array, precision=None) -> jax.Array:
    head = params["lm_head"]
    if "w_q" in head:
        w = (
            head["w_q"].astype(jnp.float32) * head["scale"][None, :]
        ).astype(hidden.dtype)
    else:
        w = head["w"]
    return jnp.dot(
        hidden, w, preferred_element_type=jnp.float32, precision=precision,
    )


# ---------------------------------------------------------------------------
# Packed training forward (dual-dense MoT)
# ---------------------------------------------------------------------------


def _select(gen_mask, gen_val, und_val):
    mask = gen_mask.reshape(gen_mask.shape + (1,) * (gen_val.ndim - 1))
    return jnp.where(mask, gen_val, und_val)


def remat_wrap(body, remat):
    """Per-layer activation checkpointing for the scan body (the reference
    wraps decoder layers in apply_activation_checkpointing NO_REENTRANT,
    pretrain_unified_navit.py:567-573).

    remat: True/'full' saves nothing (min HBM, recomputes the layer in the
    backward — the reference's only mode); 'dots' keeps matmul outputs
    (jax dots_with_no_batch_dims_saveable: ~half the recompute FLOPs for
    one activations-sized HBM slab per layer — the right trade when the
    step is MXU-bound and memory has headroom); False/'none' disables
    checkpointing (XLA keeps all residuals)."""
    if remat in (False, None, "none"):
        return body
    if remat in (True, "full"):
        return jax.checkpoint(body)
    if remat == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    raise ValueError(f"remat must be full|dots|none, got {remat!r}")


def llm_forward_train(
    params: dict,
    cfg: Qwen2Config,
    packed: jax.Array,  # [S, d] pre-assembled embeddings
    position_ids: jax.Array,  # [S]
    mask: Optional[jax.Array],  # [S, S] bool (train_packed_mask) or None
    gen_mask: jax.Array,  # [S] bool, True = gen-expert (VAE) token
    precision=None,
    remat: bool = True,
    mask_meta: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    attn_chunk: Optional[int] = None,
    context_parallel: Optional[Tuple] = None,  # (Mesh, axis_name)
    sparse_block: Optional[int] = None,
) -> jax.Array:
    """Training forward over one packed multi-sample sequence.

    MoT formulation: both experts run densely over the whole buffer and the
    result is selected per token by modality — exact semantics of the
    reference's index-scatter (qwen2_navit.py:713-755) but MXU-friendly.
    freeze_und applies stop_gradient to und-token contributions at the same
    points as the reference (:434-448, 737-748, 980-1013).

    Attention: `mask` (dense [S, S]) for moderate S; for long packed
    sequences pass mask_meta=(document_id, fan_id, noise_id) with
    attn_chunk=N to use the O(chunk*S)-memory chunked attention
    (ops/chunked.py) instead of materializing the mask.

    Returns final hidden states [S, d] (post final-norm, expert-selected).
    """
    s, d = packed.shape
    h = cfg.num_attention_heads
    kh = cfg.num_key_value_heads
    hd = cfg.head_dim
    mot = cfg.layer_module == "mot"
    eps = cfg.rms_norm_eps
    cos, sin = rope_cos_sin(position_ids, hd, cfg.rope_theta)

    if context_parallel is not None:
        # ring attention over a sequence-sharded mesh axis (context
        # parallelism — extension beyond the reference, SURVEY §2.6): the
        # per-layer attend runs under shard_map with KV + mask metadata
        # rotating around the ring.
        assert mask_meta is not None, "context_parallel needs mask_meta"
        from jax.sharding import PartitionSpec as P

        from bagel_tpu.ops.ring import ring_packed_attention

        cp_mesh, cp_axis = context_parallel
        doc_id, fan_id_, noi_id = mask_meta

        def attend(q, k, v):
            fn = partial(ring_packed_attention, axis_name=cp_axis)
            out = jax.shard_map(
                fn, mesh=cp_mesh,
                in_specs=(
                    P(None, cp_axis), P(None, cp_axis), P(None, cp_axis),
                    P(cp_axis), P(cp_axis), P(cp_axis),
                ),
                out_specs=P(None, cp_axis),
                check_vma=False,
            )(q[None], k[None], v[None], doc_id, fan_id_, noi_id)
            return out[0]
    elif sparse_block is not None:
        # block-sparse Pallas kernel: dead (q-block, kv-block) tiles are
        # skipped entirely — DMA and MXU — via per-block doc/fan liveness
        # (the flex_attention block-mask equivalent, bagel.py:156-161)
        assert mask_meta is not None, "sparse_block needs (doc, fan, noise)"
        from bagel_tpu.ops.sparse_flash import sparse_packed_attention

        doc_id, fan_id_, noi_id = mask_meta
        interp = jax.default_backend() != "tpu"

        def attend(q, k, v):
            return sparse_packed_attention(
                q, k, v, doc_id, fan_id_, noi_id,
                block_q=sparse_block, block_k=sparse_block,
                interpret=interp,
            )
    elif attn_chunk is not None:
        assert mask_meta is not None, "attn_chunk needs (doc, fan, noise) ids"
        from bagel_tpu.ops.chunked import chunked_packed_attention

        doc_id, fan_id_, noi_id = mask_meta

        def attend(q, k, v):
            return chunked_packed_attention(
                q, k, v, doc_id, fan_id_, noi_id, chunk=attn_chunk,
                precision=precision,
            )
    else:
        assert mask is not None

        def attend(q, k, v):
            return dot_attention(
                q[None], k[None], v[None], mask=mask[None],
                precision=precision,
            )[0]

    def freeze_und(x):
        if cfg.freeze_und:
            return _select(gen_mask, x, lax.stop_gradient(x))
        return x

    x = freeze_und(packed)

    def body(x, lp):
        return train_layer_block(cfg, lp, x, attend, gen_mask, cos, sin,
                                 precision), None

    body = remat_wrap(body, remat)
    x, _ = lax.scan(body, x, params["layers"])

    if cfg.use_moe:
        out = _select(
            gen_mask,
            rms_norm(x, params["final_norm_gen"], eps),
            freeze_und(rms_norm(x, params["final_norm"], eps)),
        )
    else:
        out = rms_norm(x, params["final_norm"], eps)
    return out


def train_layer_block(cfg, lp, x, attend, gen_mask, cos, sin, precision=None):
    """One decoder layer of the packed training forward: pre-norm attention
    + FFN with the MoT dual-expert select (reference semantics
    qwen2_navit.py:713-755). Shared by the lax.scan stack above and the
    pipeline-parallel stage executor (parallel/pipeline.py)."""
    s = x.shape[0]
    h = cfg.num_attention_heads
    kh = cfg.num_key_value_heads
    hd = cfg.head_dim
    mot = cfg.layer_module == "mot"
    eps = cfg.rms_norm_eps

    def freeze_und(z):
        if cfg.freeze_und:
            return _select(gen_mask, z, lax.stop_gradient(z))
        return z

    attn_u = lp["attn"]
    attn_g = lp["attn_gen"] if mot else lp["attn"]
    res = x
    if mot:
        y = _select(
            gen_mask,
            rms_norm(x, lp["input_ln_gen"], eps),
            rms_norm(x, lp["input_ln"], eps),
        )
    else:
        y = rms_norm(x, lp["input_ln"], eps)

    def qkv(attn):
        return _proj_qkv(y, attn, h, kh, hd, precision)

    if mot:
        qu, ku, vu = qkv(attn_u)
        qg, kg, vg = qkv(attn_g)
        q = jnp.where(gen_mask[:, None, None], qg, qu)
        k = jnp.where(gen_mask[:, None, None], kg, ku)
        v = jnp.where(gen_mask[:, None, None], vg, freeze_und(vu))
    else:
        q, k, v = qkv(attn_u)

    if cfg.qk_norm:
        def qknorm(z, w):
            return rms_norm(z.astype(jnp.float32), w, eps)

        if mot:
            q = jnp.where(
                gen_mask[:, None, None],
                qknorm(q, attn_g["q_norm"]),
                freeze_und(qknorm(q, attn_u["q_norm"])),
            )
            k = jnp.where(
                gen_mask[:, None, None],
                qknorm(k, attn_g["k_norm"]),
                freeze_und(qknorm(k, attn_u["k_norm"])),
            )
        else:
            q = qknorm(q, attn_u["q_norm"])
            k = qknorm(k, attn_u["k_norm"])

    q, k = apply_rope(q, k, cos, sin)
    q = q.astype(v.dtype)
    k = k.astype(v.dtype)
    att = attend(q, k, v).reshape(s, h * hd)
    if mot:
        o = _select(
            gen_mask,
            _linear(att, attn_g["o"], precision),
            _linear(att, attn_u["o"], precision),
        )
        o = _select(gen_mask, o, freeze_und(o))
    else:
        o = _linear(att, attn_u["o"], precision)
    x = res + o.astype(res.dtype)

    res = x

    def ffn(mlp, pln):
        z = rms_norm(x, pln, eps)
        return _linear(_ffn_mix(z, mlp, precision), mlp["down"], precision)

    if cfg.use_moe:
        pln_g = lp["post_ln_gen"] if mot else lp["post_ln"]
        m = _select(
            gen_mask,
            ffn(lp["mlp_gen"], pln_g),
            freeze_und(ffn(lp["mlp"], lp["post_ln"])),
        )
    else:
        m = ffn(lp["mlp"], lp["post_ln"])
    x = res + m.astype(res.dtype)
    return x


# ---------------------------------------------------------------------------
# Greedy / sampled text decode as a scan (replaces the reference's Python
# decode loop with host-side index bookkeeping, bagel.py:930-1000)
# ---------------------------------------------------------------------------


def decode_text(
    params: dict,
    cfg: Qwen2Config,
    cache: KVCache,
    start_tokens: jax.Array,  # [B]
    position_ids: jax.Array,  # [B] rope position of the start token
    *,
    max_steps: int,
    eos_id: int,
    temperature: float = 1.0,
    do_sample: bool = False,
    rng: Optional[jax.Array] = None,
    precision=None,
    early_stop: bool = True,
    active: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Autoregressive decode in one jitted loop. Returns [B, max_steps]
    tokens (eos-padded after stop) and the final cache.

    early_stop=True uses lax.while_loop and exits as soon as every row hit
    eos (the reference's Python loop break, bagel.py:996); False uses a
    fixed-length scan (differentiable, deterministic step count).

    active: optional [B] bool. Rows with active=False are frozen: they emit
    eos immediately and their cache length never advances — this is what
    lets a continuous-batching server (serving/runtime.py) decode a slot
    batch where some slots are empty or already finished, without
    corrupting those slots' KV state.
    """
    b = start_tokens.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def one_step(cache, tok, pos, done, rng):
        embeds = embed_tokens(params, tok)[:, None, :]
        q_valid = (
            (~done).astype(jnp.int32) if active is not None
            else jnp.ones((b,), jnp.int32)
        )
        hidden, cache = llm_extend(
            params, cfg, embeds, pos[:, None], cache, q_valid,
            und_len=1, causal=True, update_cache=True, precision=precision,
        )
        logits = lm_logits(params, hidden[:, 0], precision)
        rng, sub = jax.random.split(rng)
        if do_sample:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(done, eos_id, nxt.astype(tok.dtype))
        done = done | (nxt == eos_id)
        return cache, nxt, pos + 1, done, rng

    done0 = ~active if active is not None else jnp.zeros((b,), bool)
    if early_stop:
        out0 = jnp.full((b, max_steps), eos_id, start_tokens.dtype)

        def cond(state):
            step, _, _, _, done, _, _ = state
            return (step < max_steps) & ~jnp.all(done)

        def body(state):
            step, cache, tok, pos, done, rng, out = state
            cache, nxt, pos, done, rng = one_step(cache, tok, pos, done, rng)
            out = lax.dynamic_update_slice(out, nxt[:, None], (0, step))
            return (step + 1, cache, tok.at[:].set(nxt), pos, done, rng, out)

        (_, cache, _, _, _, _, toks) = lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), cache, start_tokens, position_ids,
             done0, rng, out0),
        )
        return toks, cache

    def step(carry, _):
        cache, tok, pos, done, rng = carry
        cache, nxt, pos, done, rng = one_step(cache, tok, pos, done, rng)
        return (cache, nxt, pos, done, rng), nxt

    (cache, _, _, _, _), toks = lax.scan(
        step,
        (cache, start_tokens, position_ids, done0, rng),
        None,
        length=max_steps,
    )
    return toks.T, cache  # [B, max_steps]
