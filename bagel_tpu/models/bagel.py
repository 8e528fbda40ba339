"""Bagel unified multimodal model: assembly of LLM + ViT + VAE adapters.

TPU-native re-design of the reference wrapper (modeling/bagel/bagel.py):
- adapters: DiT-style timestep embedder MLP, ViT->LLM MLP connector, frozen
  2-D sin-cos position tables (modeling_utils.py:74-144)
- packed training forward producing per-element CE/MSE losses
  (bagel.py:101-229)
- inference building blocks used by the engine: block assembly for text /
  ViT-image / VAE-image / latent-generation blocks, the rectified-flow
  velocity step and CFG combination (bagel.py:644-907).

All functions are pure; the Python index bookkeeping of the reference's
prepare_* methods lives host-side in bagel_tpu/inference/engine.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from bagel_tpu.configs import BagelConfig
from bagel_tpu.models import qwen2
from bagel_tpu.models.siglip import init_siglip_params, siglip_encode
from bagel_tpu.models.vae import init_vae_params, vae_decode, vae_encode
from bagel_tpu.ops.attention import train_packed_mask
from bagel_tpu.ops.embeds import sincos_2d_grid, timestep_embedding
from bagel_tpu.ops.norms import rms_norm  # noqa: F401  (re-export convenience)


def _dense_init(key, d_in, d_out, dtype, std=0.02, zero=False):
    if zero:
        w = jnp.zeros((d_in, d_out), jnp.float32)
    else:
        w = jax.random.normal(key, (d_in, d_out), jnp.float32) * std
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def _linear(x, p, precision=None):
    out = jnp.dot(x, p["w"], preferred_element_type=jnp.float32,
                  precision=precision)
    return (out + p["b"].astype(jnp.float32)).astype(x.dtype)


def init_bagel_params(key, cfg: BagelConfig, dtype=jnp.bfloat16) -> dict:
    """Full parameter pytree: llm / vit / vae / adapters.

    llm2vae starts at zero (reference _init_weights, bagel.py:96-99).
    The sin-cos position tables are frozen buffers regenerated from config,
    which is what makes checkpoint resolution retargeting free (SURVEY §5.4).
    """
    keys = jax.random.split(key, 8)
    d = cfg.llm.hidden_size
    params = {"llm": qwen2.init_qwen2_params(keys[0], cfg.llm, dtype)}
    if cfg.visual_und:
        params["vit"] = init_siglip_params(keys[1], cfg.vit, dtype)
        params["connector"] = {
            "fc1": _dense_init(keys[2], cfg.vit.hidden_size, d, dtype),
            "fc2": _dense_init(keys[3], d, d, dtype),
        }
        params["vit_pos_embed"] = sincos_2d_grid(
            d, cfg.vit_max_num_patch_per_side
        ).astype(dtype)
    if cfg.visual_gen:
        params["vae"] = init_vae_params(keys[4], cfg.vae, jnp.float32)
        pd = cfg.patch_latent_dim
        params["time_embed"] = {
            "fc1": _dense_init(keys[5], 256, d, dtype),
            "fc2": _dense_init(keys[6], d, d, dtype),
        }
        params["vae2llm"] = _dense_init(keys[7], pd, d, dtype)
        params["llm2vae"] = _dense_init(keys[7], d, pd, dtype, zero=True)
        params["latent_pos_embed"] = sincos_2d_grid(
            d, cfg.max_latent_size
        ).astype(dtype)
    return params


def time_embed(params, t, precision=None):
    """Scalar timesteps [N] -> [N, d] (TimestepEmbedder, modeling_utils.py:74-110)."""
    freq = timestep_embedding(t, 256)
    h = _linear(freq, params["time_embed"]["fc1"], precision)
    return _linear(jax.nn.silu(h), params["time_embed"]["fc2"], precision)


def connector_apply(params, x, precision=None):
    """ViT hidden -> LLM hidden (MLPconnector, modeling_utils.py:113-124)."""
    h = _linear(x, params["connector"]["fc1"], precision)
    return _linear(jax.nn.gelu(h, approximate=True),
                   params["connector"]["fc2"], precision)


def encode_vit_tokens(
    params, cfg: BagelConfig, patches, pos_ids, seg_ids, precision=None
):
    """Packed image patches -> LLM-space embeddings (+ frozen 2-D pos table)."""
    h = siglip_encode(params["vit"], cfg.vit, patches, pos_ids, seg_ids, precision)
    h = connector_apply(params, h, precision)
    return h + params["vit_pos_embed"][pos_ids].astype(h.dtype)


def latent_to_llm(
    params, cfg: BagelConfig, x_t, t, latent_pos_ids, precision=None
):
    """VAE latent patches [N, pd] + timesteps [N] -> LLM-space embeddings.

    vae2llm(x) + time_embed(t) + latent_pos_embed (bagel.py:196, :523, :803).
    """
    h = _linear(x_t, params["vae2llm"], precision)
    h = h + time_embed(params, t, precision).astype(h.dtype)
    return h + params["latent_pos_embed"][latent_pos_ids].astype(h.dtype)


def patchify_latent(z: jax.Array, p: int) -> jax.Array:
    """[h*p, w*p, C] latent grid -> [h*w, p*p*C] patch rows (bagel.py:184-188
    einsum chpwq->hwpqc, per-patch layout (p, q, c))."""
    hp, wp, c = z.shape
    h, w = hp // p, wp // p
    z = z.reshape(h, p, w, p, c).transpose(0, 2, 1, 3, 4)
    return z.reshape(h * w, p * p * c)


def unpatchify_latent(x: jax.Array, h: int, w: int, p: int, c: int) -> jax.Array:
    """[h*w, p*p*C] -> [h*p, w*p, C] (inferencer.py:174-181)."""
    z = x.reshape(h, w, p, p, c).transpose(0, 2, 1, 3, 4)
    return z.reshape(h * p, w * p, c)


def shifted_timesteps(num_timesteps: int, shift: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Denoise schedule: t_i over linspace(1, 0) with timestep shift
    t' = s*t / (1 + (s-1) t); returns (timesteps [T-1], dts [T-1])
    (bagel.py:693-696)."""
    t = jnp.linspace(1.0, 0.0, num_timesteps)
    t = shift * t / (1 + (shift - 1) * t)
    dts = t[:-1] - t[1:]
    return t[:-1], dts


def cfg_combine(
    v_cond: jax.Array,  # [N, pd]
    v_text: Optional[jax.Array],
    v_img: Optional[jax.Array],
    cfg_text_scale: float,
    cfg_img_scale: float,
    cfg_renorm_type: str = "global",
    cfg_renorm_min: float = 0.0,
) -> jax.Array:
    """Dual classifier-free guidance with renormalization (bagel.py:873-902).

    renorm types: "global" (one norm over the whole field), "channel"
    (per-token norm), "text_channel" (renorm the text-CFG result per token
    before applying image CFG).
    """
    if v_text is None or cfg_text_scale <= 1.0:
        return v_cond

    def renorm(v_ref, v_new, axis):
        n_ref = jnp.linalg.norm(v_ref, axis=axis, keepdims=True)
        n_new = jnp.linalg.norm(v_new, axis=axis, keepdims=True)
        scale = jnp.clip(n_ref / (n_new + 1e-8), cfg_renorm_min, 1.0)
        return v_new * scale

    if cfg_renorm_type == "text_channel":
        v_t = v_text + cfg_text_scale * (v_cond - v_text)
        v_t = renorm(v_cond, v_t, axis=-1)
        if v_img is not None and cfg_img_scale > 1.0:
            return v_img + cfg_img_scale * (v_t - v_img)
        return v_t

    v_t = v_text + cfg_text_scale * (v_cond - v_text)
    if v_img is not None and cfg_img_scale > 1.0:
        v_t = v_img + cfg_img_scale * (v_t - v_img)
    if cfg_renorm_type == "global":
        return renorm(v_cond, v_t, axis=None)
    elif cfg_renorm_type == "channel":
        return renorm(v_cond, v_t, axis=-1)
    raise NotImplementedError(cfg_renorm_type)


# ---------------------------------------------------------------------------
# Training forward
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedTrainBatch:
    """One packed multi-sample training sequence with static shapes.

    Replaces the reference's dict-of-index-lists batch (bagel.py:101-150)
    with scatter indexes into a fixed-length buffer plus mask metadata.
    Padding convention: scatter indexes of padded entries point at slot
    `seq_len - 1` reserved as a sink with document_id 0 and zero loss weight.
    """

    # text
    text_ids: jax.Array  # [n_text] int32
    text_idx: jax.Array  # [n_text] scatter positions into the sequence
    # vit (may be empty)
    vit_patches: jax.Array  # [n_vit, vit_patch_dim]
    vit_pos_ids: jax.Array  # [n_vit]
    vit_seg_ids: jax.Array  # [n_vit] image index (1-based), 0 = pad
    vit_idx: jax.Array  # [n_vit]
    # vae/gen (may be empty); clean latent patches pre-patchified host-side
    vae_patches: jax.Array  # [n_vae, patch_latent_dim]
    vae_pos_ids: jax.Array  # [n_vae]
    vae_idx: jax.Array  # [n_vae]
    vae_timesteps: jax.Array  # [n_vae] raw (pre-sigmoid) flow timesteps
    # sequence metadata
    position_ids: jax.Array  # [S]
    document_id: jax.Array  # [S] int32, 0 = pad
    fan_id: jax.Array  # [S] full-and-noise split id, -1 elsewhere
    noise_id: jax.Array  # [S] noise split id, -1 elsewhere
    gen_mask: jax.Array  # [S] bool
    # losses
    ce_idx: jax.Array  # [n_ce] sequence positions with CE loss
    ce_labels: jax.Array  # [n_ce]
    ce_weight: jax.Array  # [n_ce] float (len2weight * valid)
    mse_weight: jax.Array  # [n_vae] float (1.0 where this vae token has loss)

    @property
    def seq_len(self):
        return self.position_ids.shape[0]


def bagel_forward_train(
    params: dict,
    cfg: BagelConfig,
    batch: PackedTrainBatch,
    noise: jax.Array,  # [n_vae, patch_latent_dim] flow noise
    precision=None,
    attn_chunk=None,
    context_parallel=None,
    sparse_block=None,
    expert_parallel=None,  # (Mesh, axis): MoT experts sharded 2-way
    remat="full",  # per-layer activation ckpt: full | dots | none
) -> Dict[str, jax.Array]:
    """Packed training forward -> per-element losses.

    Matches Bagel.forward (bagel.py:101-229): text embeds + ViT embeds +
    noised VAE latents scattered into one sequence; composed attention mask;
    MoT LLM; CE on ce_idx positions against labels, MSE against (noise - x0)
    on vae tokens with timestep > 0.

    Returns dict with 'ce' [n_ce], 'ce_weight', 'mse' [n_vae], 'mse_weight'
    (weights zero out padding / no-loss entries; reduction happens in the
    train step so token counts can be normalized globally via psum).
    """
    seq, timesteps = _assemble_train_seq(params, cfg, batch, noise, precision)

    if attn_chunk is None and context_parallel is None and sparse_block is None:
        mask = train_packed_mask(
            batch.document_id, batch.fan_id, batch.noise_id
        )
        meta = None
    else:  # long sequences: no dense [S, S] mask materialization
        mask = None
        meta = (batch.document_id, batch.fan_id, batch.noise_id)
    if expert_parallel is not None:
        from bagel_tpu.parallel.expert import ep_llm_forward_train

        assert sparse_block is None, (
            "expert_parallel composes with the dense-mask or attn_chunk "
            "attention paths, not sparse_block"
        )
        ep_mesh, ep_axis = expert_parallel
        hidden = ep_llm_forward_train(
            params["llm"], cfg.llm, seq, batch.position_ids, mask,
            batch.gen_mask, ep_mesh, ep_axis, precision,
            mask_meta=meta, attn_chunk=attn_chunk, remat=remat,
        )
    else:
        hidden = qwen2.llm_forward_train(
            params["llm"], cfg.llm, seq, batch.position_ids, mask,
            batch.gen_mask, precision, mask_meta=meta, attn_chunk=attn_chunk,
            context_parallel=context_parallel, sparse_block=sparse_block,
            remat=remat,
        )
    return _train_heads(params, cfg, batch, noise, hidden, timesteps,
                        precision)


def bagel_forward_train_pp(
    params: dict,
    cfg: BagelConfig,
    batch: "PackedTrainBatch",  # leading microbatch axis on every leaf
    noise: jax.Array,  # [B, n_vae, patch_latent_dim]
    mesh,
    axis: str = "pp",
    precision=None,
    attn_chunk=None,
    remat="full",
) -> Dict[str, jax.Array]:
    """Pipeline-parallel packed training forward over a stacked batch.

    Same math as vmapping bagel_forward_train over the rows (gradient
    parity: tests/test_pipeline.py); the MoT layer stack is staged over
    the ``axis`` mesh dim and the rows flow through as GPipe microbatches
    (parallel/pipeline.py). Assembly and loss heads run replicated."""
    from bagel_tpu.parallel.pipeline import pipeline_llm_forward_train

    seqs, timesteps = jax.vmap(
        lambda b, n: _assemble_train_seq(params, cfg, b, n, precision)
    )(batch, noise)
    if attn_chunk is None:
        masks = jax.vmap(train_packed_mask)(
            batch.document_id, batch.fan_id, batch.noise_id
        )
        meta = None
    else:
        masks = None
        meta = (batch.document_id, batch.fan_id, batch.noise_id)
    hidden = pipeline_llm_forward_train(
        params["llm"], cfg.llm, seqs, batch.position_ids, batch.gen_mask,
        masks, mesh, axis, precision, mask_meta=meta, attn_chunk=attn_chunk,
        remat=remat,
    )
    return jax.vmap(
        lambda b, n, h, t: _train_heads(params, cfg, b, n, h, t, precision)
    )(batch, noise, hidden, timesteps)


def _assemble_train_seq(params, cfg, batch, noise, precision=None):
    """Scatter text embeds + ViT embeds + noised VAE latents into one packed
    [S, d] sequence (bagel.py:151-197). Returns (seq, timesteps)."""
    s = batch.seq_len
    d = cfg.llm.hidden_size
    dtype = params["llm"]["embed"].dtype

    seq = jnp.zeros((s, d), dtype)
    text_emb = qwen2.embed_tokens(params["llm"], batch.text_ids)
    seq = seq.at[batch.text_idx].set(text_emb)

    if cfg.visual_und and batch.vit_patches.shape[0] > 0:
        vit_emb = encode_vit_tokens(
            params, cfg, batch.vit_patches.astype(dtype), batch.vit_pos_ids,
            batch.vit_seg_ids, precision,
        )
        seq = seq.at[batch.vit_idx].set(vit_emb)

    timesteps = None
    if cfg.visual_gen and batch.vae_patches.shape[0] > 0:
        # sigmoid + shift of raw timesteps (bagel.py:191-192)
        tt = jax.nn.sigmoid(batch.vae_timesteps)
        ts = cfg.timestep_shift
        timesteps = ts * tt / (1 + (ts - 1) * tt)
        x0 = batch.vae_patches
        x_t = (1 - timesteps[:, None]) * x0 + timesteps[:, None] * noise
        lat_emb = latent_to_llm(
            params, cfg, x_t.astype(dtype), timesteps, batch.vae_pos_ids,
            precision,
        )
        seq = seq.at[batch.vae_idx].set(lat_emb)
    return seq, timesteps


def _train_heads(params, cfg, batch, noise, hidden, timesteps,
                 precision=None) -> Dict[str, jax.Array]:
    """Loss heads over the final hidden states: llm2vae -> per-element MSE
    vs (noise - x0) on vae tokens, lm_head -> per-token CE on ce_idx
    positions (bagel.py:217-229)."""
    out: Dict[str, jax.Array] = {}
    if cfg.visual_gen and batch.vae_patches.shape[0] > 0:
        v_pred = _linear(hidden[batch.vae_idx], params["llm2vae"], precision)
        target = noise - batch.vae_patches  # v = x1 - x0 (bagel.py:220)
        mse = (v_pred.astype(jnp.float32) - target) ** 2
        has_loss = batch.mse_weight * (timesteps > 0)
        out["mse"] = mse
        out["mse_weight"] = has_loss
    ce_logits = qwen2.lm_logits(params["llm"], hidden[batch.ce_idx], precision)
    logp = jax.nn.log_softmax(ce_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, batch.ce_labels[:, None], axis=-1)[:, 0]
    out["ce"] = ce
    out["ce_weight"] = batch.ce_weight
    return out
