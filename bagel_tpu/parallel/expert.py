"""Expert parallelism (ep) for the MoT dual-expert decoder.

BAGEL's Mixture-of-Transformer-experts routes tokens deterministically by
modality: und-expert weights see text/ViT tokens, gen-expert weights see VAE
tokens (reference qwen2_navit.py:713-755). The repo's default training
formulation runs BOTH experts densely over the packed buffer and selects by
``gen_mask`` — MXU-friendly, but every device pays 2x the expert FLOPs and
holds 2x the expert weights.

Expert parallelism splits exactly that redundancy over a 2-way mesh axis:

- Paired expert subtrees (``attn``/``attn_gen``, ``mlp``/``mlp_gen``,
  ``input_ln``/``input_ln_gen``, ``post_ln``/``post_ln_gen``) are stacked
  on a leading ``[2, L, ...]`` axis and sharded over ``ep`` — each device
  holds ONE expert's weights (halves expert-weight memory).
- Inside a ``shard_map``, device ``e`` runs only expert ``e``'s matmuls
  over the full packed sequence; the dense formulation's
  ``where(gen_mask, gen_out, und_out)`` select becomes a masked ``psum``
  (each device contributes its expert's values on its own tokens — the
  combine IS the routing, one collective per expert-parallel region:
  input-norm, fused QKV, o-proj, FFN = 4/layer).
- Attention itself runs on the combined q/k/v replicated on both devices
  (it is modality-crossing by construction, so it cannot be
  expert-sharded; compose with tp to shard its heads).

``freeze_und`` semantics carry exactly: the und device stop-gradients its
contribution at the same points the dense path freezes und-token values
(qk-norm outputs, v, o, FFN — models/qwen2.train_layer_block). Gradient
parity vs the dense path: tests/test_expert.py.

The reference has no expert parallelism (SURVEY §2.6: FSDP flat-shards both
experts' weights; both always compute); this is the TPU-native scaling axis
its MoT design implies.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from bagel_tpu.configs import Qwen2Config
from bagel_tpu.ops.attention import dot_attention
from bagel_tpu.ops.norms import rms_norm
from bagel_tpu.ops.rope import apply_rope, rope_cos_sin

# (und_key, gen_key) subtree pairs stacked over the ep axis when both exist
_EXPERT_PAIRS = (
    ("attn", "attn_gen"),
    ("mlp", "mlp_gen"),
    ("input_ln", "input_ln_gen"),
    ("post_ln", "post_ln_gen"),
)


def split_expert_layers(layers: dict):
    """Partition a stacked-layer param dict into (stacked, shared): stacked
    holds ``[2, L, ...]`` expert-paired leaves (und = index 0, matching the
    routing convention gen_mask=False -> und), shared the rest."""
    stacked, shared = {}, {}
    taken = set()
    for und_k, gen_k in _EXPERT_PAIRS:
        if und_k in layers and gen_k in layers:
            stacked[und_k] = jax.tree.map(
                lambda u, g: jnp.stack([u, g]), layers[und_k], layers[gen_k]
            )
            taken |= {und_k, gen_k}
    for k, v in layers.items():
        if k not in taken:
            shared[k] = v
    assert stacked, "expert_parallel needs a dual-expert (mot/moe) config"
    return stacked, shared


def ep_llm_forward_train(
    params: dict,
    cfg: Qwen2Config,
    packed: jax.Array,  # [S, d] assembled embeddings
    position_ids: jax.Array,  # [S]
    mask: Optional[jax.Array],  # [S, S] bool dense train mask
    gen_mask: jax.Array,  # [S] bool, True = gen-expert (VAE) token
    mesh: Mesh,
    axis: str = "ep",
    precision=None,
    remat: bool = True,
    mask_meta=None,  # (doc_id, fan_id, noise_id); required for attn_chunk
    attn_chunk: Optional[int] = None,
) -> jax.Array:
    """Expert-parallel packed training forward.

    Same math as ``qwen2.llm_forward_train`` (dense dual-expert + select);
    the expert pair is sharded over the 2-way ``axis`` mesh dim. Returns
    final hidden states [S, d], replicated across the ep axis.
    """
    from bagel_tpu.models.qwen2 import _ffn_mix, _linear, _proj_qkv, _select

    assert mesh.shape[axis] == 2, (
        f"expert_parallel needs axis '{axis}' of size 2 (und/gen), "
        f"got {mesh.shape[axis]}"
    )
    s = packed.shape[0]
    h = cfg.num_attention_heads
    kh = cfg.num_key_value_heads
    hd = cfg.head_dim
    mot = cfg.layer_module == "mot"
    eps = cfg.rms_norm_eps
    cos, sin = rope_cos_sin(position_ids, hd, cfg.rope_theta)
    stacked, shared = split_expert_layers(params["layers"])

    if attn_chunk is not None:
        assert mask_meta is not None, "attn_chunk needs (doc, fan, noise)"
        consts = tuple(mask_meta)
    else:
        assert mask is not None
        consts = (mask,)

    def freeze_und_tokens(z):
        if cfg.freeze_und:
            return _select(gen_mask, z, lax.stop_gradient(z))
        return z

    x0 = freeze_und_tokens(packed)

    def ep_prog(stacked_local, shared, x, cos, sin, gen_mask, *consts):
        local = jax.tree.map(lambda a: a[0], stacked_local)  # my expert
        eidx = lax.axis_index(axis)  # 0 = und, 1 = gen
        mine = jnp.where(eidx == 1, gen_mask, ~gen_mask)  # [S]

        def combine(tree):
            """Masked psum: each device contributes its expert's values on
            its own tokens — the dense path's modality select."""
            def sel(z):
                m = mine.reshape((s,) + (1,) * (z.ndim - 1))
                return jnp.where(m, z, jnp.zeros_like(z))

            return lax.psum(jax.tree.map(sel, tree), axis)

        def und_freeze(z):
            """Stop-gradient my contribution iff I am the und device (the
            dense path's freeze_und restricted to my tokens)."""
            return jnp.where(eidx == 0, lax.stop_gradient(z), z)

        if attn_chunk is not None:
            from bagel_tpu.ops.chunked import chunked_packed_attention

            doc, fan, noi = consts

            def attend(q, k, v):
                return chunked_packed_attention(
                    q, k, v, doc, fan, noi, chunk=attn_chunk,
                    precision=precision,
                )
        else:
            dense_mask = consts[0]

            def attend(q, k, v):
                return dot_attention(
                    q[None], k[None], v[None], mask=dense_mask[None],
                    precision=precision,
                )[0]

        def layer(x, lp):
            ep, sh = lp["ep"], lp["sh"]
            attn_w = ep["attn"] if mot else sh["attn"]
            in_ln = ep["input_ln"] if mot else sh["input_ln"]
            post_ln = ep["post_ln"] if mot else sh["post_ln"]
            mlp_w = ep["mlp"]

            res = x
            if mot:
                y = combine(rms_norm(x, in_ln, eps))
            else:
                y = rms_norm(x, in_ln, eps)

            q, k, v = _proj_qkv(y, attn_w, h, kh, hd, precision)
            if cfg.qk_norm:
                q = rms_norm(q.astype(jnp.float32), attn_w["q_norm"], eps)
                k = rms_norm(k.astype(jnp.float32), attn_w["k_norm"], eps)
                if mot and cfg.freeze_und:
                    q, k = und_freeze(q), und_freeze(k)
            if mot and cfg.freeze_und:
                v = und_freeze(v)
            if mot:
                q, k, v = combine((q, k, v))
            q, k = apply_rope(q, k, cos, sin)
            q = q.astype(v.dtype)
            k = k.astype(v.dtype)
            att = attend(q, k, v).reshape(s, h * hd)

            o = _linear(att, attn_w["o"], precision)
            if mot:
                if cfg.freeze_und:
                    o = und_freeze(o)
                o = combine(o)
            x = res + o.astype(res.dtype)

            res = x
            z = rms_norm(x, post_ln, eps)
            m = _linear(_ffn_mix(z, mlp_w, precision), mlp_w["down"],
                        precision)
            if cfg.freeze_und:
                m = und_freeze(m)
            m = combine(m)  # FFN is always dual under use_moe
            x = res + m.astype(res.dtype)
            return x, None

        from bagel_tpu.models.qwen2 import remat_wrap

        layer = remat_wrap(layer, remat)
        x, _ = lax.scan(layer, x, {"ep": local, "sh": shared})
        return x

    stacked_spec = jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked
    )
    repl = P()
    shared_spec = jax.tree.map(lambda a: repl, shared)
    hidden = jax.shard_map(
        ep_prog,
        mesh=mesh,
        in_specs=(stacked_spec, shared_spec, repl, repl, repl, repl)
        + tuple(repl for _ in consts),
        out_specs=repl,
        check_vma=False,
    )(stacked, shared, x0, cos, sin, gen_mask, *consts)

    # final norm + expert select, replicated (identical on every device)
    if cfg.use_moe:
        out = _select(
            gen_mask,
            rms_norm(hidden, params["final_norm_gen"], eps),
            freeze_und_tokens(rms_norm(hidden, params["final_norm"], eps)),
        )
    else:
        out = rms_norm(hidden, params["final_norm"], eps)
    return out
