"""Checkpoint conversion: reference torch state dicts -> bagel_tpu pytrees.

Consumes the HF-released BAGEL checkpoint layout ({llm_config.json,
vit_config.json, ae.safetensors, ema.safetensors, tokenizer} — app.py:39-48)
or any state dict with the reference's module names, and produces the
stacked-layer parameter pytree this framework uses.

Transformations applied (SURVEY §5.4):
- per-layer weights stacked on a leading L axis (lax.scan layout)
- torch Linear [out, in] -> [in, out]; conv OIHW -> HWIO
- the ViT conv patch-embed becomes a Linear over flattened (p, q, c) patches
  (the reference does this at load time too, siglip_navit.py:167-182)
- `*_moe_gen` names map to the `*_gen` subtrees
- fixed sin-cos position tables (vit_pos_embed / latent_pos_embed) are
  DROPPED and regenerated from config — this is what makes checkpoint
  resolution retargeting free (fsdp_utils.py:162-178 pops them on load)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from bagel_tpu.configs import BagelConfig, Qwen2Config, SiglipConfig, VAEConfig


def _t(x):  # torch Linear -> [in, out]
    return jnp.asarray(np.ascontiguousarray(x.T))


def _a(x):
    return jnp.asarray(np.asarray(x))


def _conv(sd, name):  # OIHW -> HWIO
    return {
        "w": jnp.asarray(np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0)),
        "b": _a(sd[name + ".bias"]),
    }


def _gn(sd, name):
    return {"w": _a(sd[name + ".weight"]), "b": _a(sd[name + ".bias"])}


def convert_llm(sd: Dict[str, np.ndarray], cfg: Qwen2Config, prefix: str = "language_model.") -> dict:
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        mats = [np.asarray(sd[prefix + fmt.format(i)]) for i in range(L)]
        arr = np.stack(mats, 0)
        if transpose and arr.ndim == 3:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    def attn(g=""):
        p = "model.layers.{0}.self_attn."
        out = {
            "q": {"w": stack(p + f"q_proj{g}.weight"), "b": stack(p + f"q_proj{g}.bias", False)},
            "k": {"w": stack(p + f"k_proj{g}.weight"), "b": stack(p + f"k_proj{g}.bias", False)},
            "v": {"w": stack(p + f"v_proj{g}.weight"), "b": stack(p + f"v_proj{g}.bias", False)},
            "o": {"w": stack(p + f"o_proj{g}.weight")},
        }
        if cfg.qk_norm:
            out["q_norm"] = stack(p + f"q_norm{g}.weight", False)
            out["k_norm"] = stack(p + f"k_norm{g}.weight", False)
        return out

    def mlp(g=""):
        return {
            "gate": stack("model.layers.{0}.mlp%s.gate_proj.weight" % g),
            "up": stack("model.layers.{0}.mlp%s.up_proj.weight" % g),
            "down": stack("model.layers.{0}.mlp%s.down_proj.weight" % g),
        }

    layers = {
        "attn": attn(""),
        "mlp": mlp(""),
        "input_ln": stack("model.layers.{0}.input_layernorm.weight", False),
        "post_ln": stack("model.layers.{0}.post_attention_layernorm.weight", False),
    }
    if cfg.layer_module == "mot":
        layers["attn_gen"] = attn("_moe_gen")
        layers["input_ln_gen"] = stack(
            "model.layers.{0}.input_layernorm_moe_gen.weight", False
        )
        layers["post_ln_gen"] = stack(
            "model.layers.{0}.post_attention_layernorm_moe_gen.weight", False
        )
    if cfg.use_moe:
        layers["mlp_gen"] = mlp("_moe_gen")

    params = {
        "embed": _a(sd[prefix + "model.embed_tokens.weight"]),
        "layers": layers,
        "final_norm": _a(sd[prefix + "model.norm.weight"]),
        "lm_head": {"w": _t(sd[prefix + "lm_head.weight"])},
    }
    if cfg.use_moe:
        params["final_norm_gen"] = _a(sd[prefix + "model.norm_moe_gen.weight"])
    return params


def convert_vit(sd: Dict[str, np.ndarray], cfg: SiglipConfig, prefix: str = "vit_model.") -> dict:
    L = cfg.num_hidden_layers
    vp = prefix + "vision_model."

    def stack(fmt, transpose=True):
        arr = np.stack(
            [np.asarray(sd[vp + f"encoder.layers.{i}.{fmt}"]) for i in range(L)], 0
        )
        if transpose and arr.ndim == 3:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    def pair(p):
        return {"w": stack(p + ".weight"), "b": stack(p + ".bias", False)}

    pe_w = np.asarray(sd[vp + "embeddings.patch_embedding.weight"])
    if pe_w.ndim == 4:  # conv OIHW -> linear [p*p*c, out] in (p, q, c) order
        o = pe_w.shape[0]
        pe_w = pe_w.transpose(0, 2, 3, 1).reshape(o, -1).T
    else:  # already linear [out, in]
        pe_w = pe_w.T

    params = {
        "patch_embed": {
            "w": jnp.asarray(np.ascontiguousarray(pe_w)),
            "b": _a(sd[vp + "embeddings.patch_embedding.bias"]),
        },
        "layers": {
            "ln1": {"w": stack("layer_norm1.weight", False),
                    "b": stack("layer_norm1.bias", False)},
            "ln2": {"w": stack("layer_norm2.weight", False),
                    "b": stack("layer_norm2.bias", False)},
            "attn": {
                "q": pair("self_attn.q_proj"),
                "k": pair("self_attn.k_proj"),
                "v": pair("self_attn.v_proj"),
                "o": pair("self_attn.out_proj"),
            },
            "mlp": {"fc1": pair("mlp.fc1"), "fc2": pair("mlp.fc2")},
        },
        "post_ln": _gn(sd, vp[:-1] + ".post_layernorm"),
    }
    if not cfg.rope:
        params["pos_embed"] = _a(sd[vp + "embeddings.position_embedding.weight"])
    return params


def convert_vae(sd: Dict[str, np.ndarray], cfg: VAEConfig) -> dict:
    def res(name):
        p = {
            "norm1": _gn(sd, name + ".norm1"), "conv1": _conv(sd, name + ".conv1"),
            "norm2": _gn(sd, name + ".norm2"), "conv2": _conv(sd, name + ".conv2"),
        }
        if name + ".nin_shortcut.weight" in sd:
            p["shortcut"] = _conv(sd, name + ".nin_shortcut")
        return p

    def attn(name):
        return {
            "norm": _gn(sd, name + ".norm"),
            "q": _conv(sd, name + ".q"), "k": _conv(sd, name + ".k"),
            "v": _conv(sd, name + ".v"), "proj": _conv(sd, name + ".proj_out"),
        }

    n_levels = len(cfg.ch_mult)
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "levels": [
            {
                "blocks": [
                    res(f"encoder.down.{i}.block.{j}")
                    for j in range(cfg.num_res_blocks)
                ],
                **(
                    {"down": _conv(sd, f"encoder.down.{i}.downsample.conv")}
                    if i != n_levels - 1 else {}
                ),
            }
            for i in range(n_levels)
        ],
        "mid": {
            "block1": res("encoder.mid.block_1"),
            "attn": attn("encoder.mid.attn_1"),
            "block2": res("encoder.mid.block_2"),
        },
        "norm_out": _gn(sd, "encoder.norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": {
            "block1": res("decoder.mid.block_1"),
            "attn": attn("decoder.mid.attn_1"),
            "block2": res("decoder.mid.block_2"),
        },
        "up": [
            {
                "blocks": [
                    res(f"decoder.up.{i}.block.{j}")
                    for j in range(cfg.num_res_blocks + 1)
                ],
                **(
                    {"up": _conv(sd, f"decoder.up.{i}.upsample.conv")}
                    if i != 0 else {}
                ),
            }
            for i in range(n_levels)
        ],
        "norm_out": _gn(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    return {"encoder": enc, "decoder": dec}


def convert_bagel(
    sd: Dict[str, np.ndarray],
    cfg: BagelConfig,
    vae_sd: Optional[Dict[str, np.ndarray]] = None,
) -> dict:
    """Full Bagel state dict -> pytree. Sin-cos tables regenerated from cfg."""
    from bagel_tpu.ops.embeds import sincos_2d_grid

    d = cfg.llm.hidden_size
    params = {"llm": convert_llm(sd, cfg.llm)}
    if cfg.visual_und:
        params["vit"] = convert_vit(sd, cfg.vit)
        params["connector"] = {
            "fc1": {"w": _t(sd["connector.fc1.weight"]), "b": _a(sd["connector.fc1.bias"])},
            "fc2": {"w": _t(sd["connector.fc2.weight"]), "b": _a(sd["connector.fc2.bias"])},
        }
        params["vit_pos_embed"] = sincos_2d_grid(d, cfg.vit_max_num_patch_per_side)
    if cfg.visual_gen:
        params["time_embed"] = {
            "fc1": {"w": _t(sd["time_embedder.mlp.0.weight"]), "b": _a(sd["time_embedder.mlp.0.bias"])},
            "fc2": {"w": _t(sd["time_embedder.mlp.2.weight"]), "b": _a(sd["time_embedder.mlp.2.bias"])},
        }
        params["vae2llm"] = {"w": _t(sd["vae2llm.weight"]), "b": _a(sd["vae2llm.bias"])}
        params["llm2vae"] = {"w": _t(sd["llm2vae.weight"]), "b": _a(sd["llm2vae.bias"])}
        params["latent_pos_embed"] = sincos_2d_grid(d, cfg.max_latent_size)
        if vae_sd is not None:
            params["vae"] = convert_vae(vae_sd, cfg.vae)
    return params


def load_checkpoint_dir(path: str, cfg: BagelConfig, use_ema: bool = True) -> dict:
    """Load an HF-released BAGEL checkpoint directory (app.py:39-48 layout)."""
    from safetensors.numpy import load_file

    model_file = os.path.join(path, "ema.safetensors" if use_ema else "model.safetensors")
    sd = load_file(model_file)
    ae_path = os.path.join(path, "ae.safetensors")
    vae_sd = load_file(ae_path) if os.path.exists(ae_path) else None
    return convert_bagel(sd, cfg, vae_sd)


# ---------------------------------------------------------------------------
# Export: bagel_tpu pytrees -> reference torch state dicts (the reverse
# mapping — lets checkpoints trained here round-trip back into the
# reference ecosystem / HF release layout, fsdp_utils.py:88-150 formats)
# ---------------------------------------------------------------------------


def _unstack_t(arr) -> Dict[int, np.ndarray]:
    """[L, in, out] -> per-layer torch Linear [out, in]."""
    a = np.asarray(arr)
    return {i: np.ascontiguousarray(a[i].T) for i in range(a.shape[0])}


def _unstack(arr) -> Dict[int, np.ndarray]:
    a = np.asarray(arr)
    return {i: np.ascontiguousarray(a[i]) for i in range(a.shape[0])}


def _unconv(out: Dict[str, np.ndarray], name: str, p: dict) -> None:
    out[name + ".weight"] = np.ascontiguousarray(
        np.asarray(p["w"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
    )
    out[name + ".bias"] = np.asarray(p["b"])


def _ungn(out: Dict[str, np.ndarray], name: str, p: dict) -> None:
    out[name + ".weight"] = np.asarray(p["w"])
    out[name + ".bias"] = np.asarray(p["b"])


def export_llm(params: dict, cfg: Qwen2Config,
               prefix: str = "language_model.") -> Dict[str, np.ndarray]:
    L = cfg.num_hidden_layers
    layers = params["layers"]
    out: Dict[str, np.ndarray] = {}

    def put(fmt, per_layer):
        for i in range(L):
            out[prefix + fmt.format(i)] = per_layer[i]

    def attn(tree, g=""):
        p = "model.layers.{0}.self_attn."
        for k in ("q", "k", "v"):
            put(p + f"{k}_proj{g}.weight", _unstack_t(tree[k]["w"]))
            put(p + f"{k}_proj{g}.bias", _unstack(tree[k]["b"]))
        put(p + f"o_proj{g}.weight", _unstack_t(tree["o"]["w"]))
        if cfg.qk_norm:
            put(p + f"q_norm{g}.weight", _unstack(tree["q_norm"]))
            put(p + f"k_norm{g}.weight", _unstack(tree["k_norm"]))

    def mlp(tree, g=""):
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            put("model.layers.{0}.mlp%s.%s.weight" % (g, theirs),
                _unstack_t(tree[ours]))

    attn(layers["attn"])
    mlp(layers["mlp"])
    put("model.layers.{0}.input_layernorm.weight",
        _unstack(layers["input_ln"]))
    put("model.layers.{0}.post_attention_layernorm.weight",
        _unstack(layers["post_ln"]))
    if cfg.layer_module == "mot":
        attn(layers["attn_gen"], "_moe_gen")
        put("model.layers.{0}.input_layernorm_moe_gen.weight",
            _unstack(layers["input_ln_gen"]))
        put("model.layers.{0}.post_attention_layernorm_moe_gen.weight",
            _unstack(layers["post_ln_gen"]))
    if cfg.use_moe:
        mlp(layers["mlp_gen"], "_moe_gen")
        out[prefix + "model.norm_moe_gen.weight"] = np.asarray(
            params["final_norm_gen"]
        )
    out[prefix + "model.embed_tokens.weight"] = np.asarray(params["embed"])
    out[prefix + "model.norm.weight"] = np.asarray(params["final_norm"])
    out[prefix + "lm_head.weight"] = np.ascontiguousarray(
        np.asarray(params["lm_head"]["w"]).T
    )
    return out


def export_vit(params: dict, cfg: SiglipConfig,
               prefix: str = "vit_model.") -> Dict[str, np.ndarray]:
    L = cfg.num_hidden_layers
    vp = prefix + "vision_model."
    layers = params["layers"]
    out: Dict[str, np.ndarray] = {}

    def put(fmt, per_layer):
        for i in range(L):
            out[vp + f"encoder.layers.{i}.{fmt}"] = per_layer[i]

    def pair(name, tree):
        put(name + ".weight", _unstack_t(tree["w"]))
        put(name + ".bias", _unstack(tree["b"]))

    # patch embed back to the conv OIHW release form: [p*q*c, out] with
    # (p, q, c) input order -> [out, c, p, q]
    p = cfg.patch_size
    pe = np.asarray(params["patch_embed"]["w"])  # [p*p*3, out]
    o = pe.shape[1]
    out[vp + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        pe.T.reshape(o, p, p, 3).transpose(0, 3, 1, 2)
    )
    out[vp + "embeddings.patch_embedding.bias"] = np.asarray(
        params["patch_embed"]["b"]
    )
    pair("layer_norm1", layers["ln1"])
    pair("layer_norm2", layers["ln2"])
    pair("self_attn.q_proj", layers["attn"]["q"])
    pair("self_attn.k_proj", layers["attn"]["k"])
    pair("self_attn.v_proj", layers["attn"]["v"])
    pair("self_attn.out_proj", layers["attn"]["o"])
    pair("mlp.fc1", layers["mlp"]["fc1"])
    pair("mlp.fc2", layers["mlp"]["fc2"])
    _ungn(out, vp[:-1] + ".post_layernorm", params["post_ln"])
    if "pos_embed" in params:
        out[vp + "embeddings.position_embedding.weight"] = np.asarray(
            params["pos_embed"]
        )
    else:
        # 2-D RoPE persistent buffers (deterministic from config —
        # siglip_navit.py:102-127,338-340); emitted so strict torch loads
        # see a byte-complete state dict
        max_size = cfg.image_size // cfg.patch_size
        dim = (cfg.hidden_size // cfg.num_attention_heads) // 2
        inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
        grid = np.arange(max_size, dtype=np.float64)
        gh = np.repeat(grid[:, None], max_size, axis=1)
        gw = np.repeat(grid[None, :], max_size, axis=0)
        for side, g in (("h", gh), ("w", gw)):
            freqs = g[..., None] * inv_freq[None, None, :]
            emb = np.concatenate([freqs, freqs], -1).reshape(
                max_size * max_size, -1
            ).astype(np.float32)
            out[vp + f"rope.cos_{side}"] = np.cos(emb)
            out[vp + f"rope.sin_{side}"] = np.sin(emb)
    return out


def export_vae(params: dict, cfg: VAEConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def res(name, tree):
        _ungn(out, name + ".norm1", tree["norm1"])
        _unconv(out, name + ".conv1", tree["conv1"])
        _ungn(out, name + ".norm2", tree["norm2"])
        _unconv(out, name + ".conv2", tree["conv2"])
        if "shortcut" in tree:
            _unconv(out, name + ".nin_shortcut", tree["shortcut"])

    def attn(name, tree):
        _ungn(out, name + ".norm", tree["norm"])
        for k in ("q", "k", "v"):
            _unconv(out, name + "." + k, tree[k])
        _unconv(out, name + ".proj_out", tree["proj"])

    enc, dec = params["encoder"], params["decoder"]
    _unconv(out, "encoder.conv_in", enc["conv_in"])
    for i, lvl in enumerate(enc["levels"]):
        for j, blk in enumerate(lvl["blocks"]):
            res(f"encoder.down.{i}.block.{j}", blk)
        if "down" in lvl:
            _unconv(out, f"encoder.down.{i}.downsample.conv", lvl["down"])
    res("encoder.mid.block_1", enc["mid"]["block1"])
    attn("encoder.mid.attn_1", enc["mid"]["attn"])
    res("encoder.mid.block_2", enc["mid"]["block2"])
    _ungn(out, "encoder.norm_out", enc["norm_out"])
    _unconv(out, "encoder.conv_out", enc["conv_out"])
    _unconv(out, "decoder.conv_in", dec["conv_in"])
    res("decoder.mid.block_1", dec["mid"]["block1"])
    attn("decoder.mid.attn_1", dec["mid"]["attn"])
    res("decoder.mid.block_2", dec["mid"]["block2"])
    for i, lvl in enumerate(dec["up"]):
        for j, blk in enumerate(lvl["blocks"]):
            res(f"decoder.up.{i}.block.{j}", blk)
        if "up" in lvl:
            _unconv(out, f"decoder.up.{i}.upsample.conv", lvl["up"])
    _ungn(out, "decoder.norm_out", dec["norm_out"])
    _unconv(out, "decoder.conv_out", dec["conv_out"])
    return out


def export_bagel(params: dict, cfg: BagelConfig) -> Dict[str, np.ndarray]:
    """Pytree -> the reference Bagel state-dict key space (without the VAE,
    which the release ships separately as ae.safetensors). Fixed sin-cos
    tables are emitted under their reference names (vit_pos_embed.pos_embed
    / latent_pos_embed.pos_embed, modeling_utils.py:127-144)."""
    sd = export_llm(params["llm"], cfg.llm)
    if cfg.visual_und and "vit" in params:
        sd.update(export_vit(params["vit"], cfg.vit))
        for k in ("fc1", "fc2"):
            sd[f"connector.{k}.weight"] = np.ascontiguousarray(
                np.asarray(params["connector"][k]["w"]).T
            )
            sd[f"connector.{k}.bias"] = np.asarray(
                params["connector"][k]["b"]
            )
        sd["vit_pos_embed.pos_embed"] = np.asarray(params["vit_pos_embed"])
    if cfg.visual_gen and "time_embed" in params:
        for ours, theirs in (("fc1", "mlp.0"), ("fc2", "mlp.2")):
            sd[f"time_embedder.{theirs}.weight"] = np.ascontiguousarray(
                np.asarray(params["time_embed"][ours]["w"]).T
            )
            sd[f"time_embedder.{theirs}.bias"] = np.asarray(
                params["time_embed"][ours]["b"]
            )
        for name in ("vae2llm", "llm2vae"):
            sd[f"{name}.weight"] = np.ascontiguousarray(
                np.asarray(params[name]["w"]).T
            )
            sd[f"{name}.bias"] = np.asarray(params[name]["b"])
        sd["latent_pos_embed.pos_embed"] = np.asarray(
            params["latent_pos_embed"]
        )
    return sd


def save_checkpoint_dir(params: dict, cfg: BagelConfig, path: str,
                        ema: bool = True) -> None:
    """Write the HF release layout the reference loads (app.py:39-48):
    model.safetensors (+ ema.safetensors alias when ema=True) and, when the
    pytree carries VAE weights, ae.safetensors."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = {k: np.asarray(v) for k, v in export_bagel(params, cfg).items()}
    save_file(sd, os.path.join(path, "model.safetensors"))
    if ema:
        save_file(sd, os.path.join(path, "ema.safetensors"))
    if "vae" in params:
        save_file(
            {k: np.asarray(v)
             for k, v in export_vae(params["vae"], cfg.vae).items()},
            os.path.join(path, "ae.safetensors"),
        )
