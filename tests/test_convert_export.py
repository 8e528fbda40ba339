"""Reverse converter: pytree -> reference state-dict key space.

Round-trip through the (keyspace-validated, test_convert_keyspace.py)
import converter proves both the key names and the layout inverses: a
wrong key would KeyError in convert_*, a wrong transpose/axis order would
break exact equality."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.models.bagel import init_bagel_params
from bagel_tpu.utils.convert import (
    convert_bagel,
    convert_vae,
    export_bagel,
    export_vae,
    load_checkpoint_dir,
    save_checkpoint_dir,
)


def _assert_trees_equal(a, b):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_roundtrips_through_import():
    cfg = tiny_bagel()
    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    vae = params.pop("vae", None)

    sd = export_bagel(params, cfg)
    back = convert_bagel(sd, cfg)
    _assert_trees_equal(params, back)

    if vae is not None:
        vae_back = convert_vae(export_vae(vae, cfg.vae), cfg.vae)
        _assert_trees_equal(vae, vae_back)


def test_save_checkpoint_dir_loads_back(tmp_path):
    cfg = tiny_bagel()
    params = init_bagel_params(jax.random.PRNGKey(1), cfg, jnp.float32)

    save_checkpoint_dir(params, cfg, str(tmp_path))
    assert (tmp_path / "model.safetensors").exists()
    assert (tmp_path / "ema.safetensors").exists()
    has_vae = "vae" in params
    assert (tmp_path / "ae.safetensors").exists() == has_vae

    back = load_checkpoint_dir(str(tmp_path), cfg)
    want = dict(params)
    if not has_vae:
        want.pop("vae", None)
    _assert_trees_equal(want, back)


def test_exported_dtypes_and_torch_linear_layout():
    """Exported LLM weights are torch-Linear-shaped [out, in]."""
    cfg = tiny_bagel()
    params = init_bagel_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    sd = export_bagel(params, cfg)
    w = sd["language_model.model.layers.0.self_attn.q_proj.weight"]
    d = cfg.llm.hidden_size
    nq = cfg.llm.num_attention_heads * cfg.llm.head_dim
    assert w.shape == (nq, d)
    ours = np.asarray(params["llm"]["layers"]["attn"]["q"]["w"][0])
    np.testing.assert_array_equal(w, ours.T)
    assert sd["language_model.lm_head.weight"].shape == (
        cfg.llm.vocab_size, d
    )


def test_reference_model_loads_export_strict():
    """A stock reference Bagel accepts the exported state dict with
    strict=True — no missing, no unexpected keys."""
    import torch

    import refutil

    cfg = tiny_bagel()
    model = refutil.build_reference_bagel(cfg, eval_mode=True)

    params = init_bagel_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    params.pop("vae", None)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_bagel(params, cfg).items()}
    # the reference model was built with the conv patch-embed already
    # converted to Linear; our export ships the conv release form — apply
    # the reference's own load-time conversion (siglip_navit.py:167-182)
    pe = sd["vit_model.vision_model.embeddings.patch_embedding.weight"]
    if pe.ndim == 4:
        o = pe.shape[0]
        sd["vit_model.vision_model.embeddings.patch_embedding.weight"] = (
            pe.permute(0, 2, 3, 1).reshape(o, -1)
        )
    # exported rope buffers must equal the reference's own derivation
    for side in ("cos_h", "sin_h", "cos_w", "sin_w"):
        ref_buf = getattr(model.vit_model.vision_model.rope, side).numpy()
        np.testing.assert_allclose(
            sd[f"vit_model.vision_model.rope.{side}"].numpy(), ref_buf,
            rtol=1e-6, atol=1e-6,
        )
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    assert not missing, f"missing keys: {missing[:5]}"


def test_export_hf_cli_from_orbax(tmp_path):
    """Full workflow: Orbax train checkpoint -> HF release layout ->
    re-importable weights equal to the EMA params."""
    import optax

    from bagel_tpu.configs import tiny_bagel as _tiny
    from bagel_tpu.train.checkpoint import save_checkpoint
    from bagel_tpu.train.step import init_train_state
    from bagel_tpu.utils.export_hf import export_checkpoint

    cfg = _tiny()
    params = init_bagel_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    state = init_train_state(params, optax.adam(1e-3), use_ema=True)
    # perturb raw params so EMA vs raw is distinguishable
    import dataclasses as _dc

    state = _dc.replace(state, params=jax.tree.map(lambda a: a + 1.0,
                                                   state.params))
    ck = tmp_path / "ckpt"
    save_checkpoint(str(ck), 7, state, cfg=cfg)

    out = tmp_path / "hf"
    export_checkpoint(str(ck), str(out))  # root path -> latest step
    back = load_checkpoint_dir(str(out), cfg)
    want = dict(params)
    has_vae = (out / "ae.safetensors").exists()
    if not has_vae:
        want.pop("vae", None)
    _assert_trees_equal(want, back)  # EMA == original (pre-perturb) params

    meta = json.loads((out / "export_meta.json").read_text())
    assert meta["weights"] == "ema" and meta["step"] == 0
