"""SigLIP NaViT tower: golden parity vs the torch reference (CPU oracle).

The reference tower only runs with flash_attn; the test injects a CPU varlen
attention oracle (per-segment SDPA in fp32) in its place.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import refutil  # noqa: F401

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_siglip
from bagel_tpu.models.siglip import init_siglip_params, siglip_encode

PREC = "float32"


def _cpu_varlen_attention(q, k, v, cu_seqlens_q, cu_seqlens_k,
                          max_seqlen_q, max_seqlen_k, causal=False):
    outs = []
    for i in range(len(cu_seqlens_q) - 1):
        s, e = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
        qq = q[s:e].float().transpose(0, 1)[None]
        kk = k[s:e].float().transpose(0, 1)[None]
        vv = v[s:e].float().transpose(0, 1)[None]
        o = F.scaled_dot_product_attention(qq, kk, vv, is_causal=causal)
        outs.append(o[0].transpose(0, 1))
    return torch.cat(outs, 0)


@pytest.fixture(scope="module")
def setup():
    from modeling.bagel import siglip_navit as ref_mod

    ref_mod.flash_attn_varlen_func = _cpu_varlen_attention

    cfg = tiny_siglip()
    ref_cfg = ref_mod.SiglipVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        rope=True,
    )
    torch.manual_seed(0)
    model = ref_mod.SiglipVisionModel(ref_cfg).eval()
    model.vision_model.embeddings.convert_conv2d_to_linear(ref_cfg)
    return cfg, model


def _convert(model, cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        arr = np.stack(
            [sd["vision_model.encoder.layers.%d.%s" % (i, fmt)] for i in range(L)], 0
        )
        if transpose and arr.ndim == 3:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    def pair(prefix):
        return {"w": stack(prefix + ".weight"), "b": stack(prefix + ".bias", False)}

    return {
        "patch_embed": {
            "w": jnp.asarray(sd["vision_model.embeddings.patch_embedding.weight"].T),
            "b": jnp.asarray(sd["vision_model.embeddings.patch_embedding.bias"]),
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
        "post_ln": {
            "w": jnp.asarray(sd["vision_model.post_layernorm.weight"]),
            "b": jnp.asarray(sd["vision_model.post_layernorm.bias"]),
        },
    }


def test_siglip_tower_matches_reference(setup):
    from data.data_utils import (
        get_flattened_position_ids_extrapolate,
        patchify,
    )

    cfg, model = setup
    my_params = _convert(model, cfg)
    rng = np.random.default_rng(0)

    # two images of different resolutions, packed
    imgs = [
        rng.standard_normal((3, 56, 42)).astype(np.float32),
        rng.standard_normal((3, 28, 70)).astype(np.float32),
    ]
    patches, pos_ids, seg_ids, seqlens = [], [], [], []
    for i, im in enumerate(imgs):
        t = patchify(torch.from_numpy(im), cfg.patch_size)
        p = get_flattened_position_ids_extrapolate(
            im.shape[1], im.shape[2], cfg.patch_size, cfg.num_patches_per_side
        )
        patches.append(t)
        pos_ids.append(p)
        seg_ids += [i + 1] * t.shape[0]
        seqlens.append(t.shape[0])

    packed = torch.cat(patches, 0)
    pos = torch.cat(pos_ids, 0)
    cu = torch.tensor([0, seqlens[0], seqlens[0] + seqlens[1]], dtype=torch.int32)

    with torch.no_grad():
        expected = model(
            packed_pixel_values=packed,
            packed_flattened_position_ids=pos,
            cu_seqlens=cu,
            max_seqlen=max(seqlens),
        ).numpy()

    got = siglip_encode(
        my_params, cfg,
        jnp.asarray(packed.numpy()),
        jnp.asarray(pos.numpy()),
        jnp.asarray(seg_ids, dtype=jnp.int32),
        precision=PREC,
    )
    # The reference rounds q/k/v to bf16 at its flash-attention call site
    # (siglip_navit.py:233-235) — inside its own forward, so the oracle is
    # bf16-perturbed while our test path runs fp32. Assert at bf16-level
    # tolerance plus a tight MAE bound (a structural bug — wrong rope, mask,
    # layout — produces O(1) errors, not 1e-3).
    got_np = np.asarray(got)
    np.testing.assert_allclose(got_np, expected, rtol=2e-2, atol=2e-2)
    assert np.abs(got_np - expected).mean() < 2e-3


def test_siglip_padding_invariance(setup):
    """Appending padded tokens (segment 0) must not change real outputs."""
    cfg, model = setup
    my_params = _convert(model, cfg)
    rng = np.random.default_rng(1)
    n = 12
    patches = rng.standard_normal((n, cfg.patch_dim)).astype(np.float32)
    pos = rng.integers(0, cfg.num_patches_per_side**2, size=n)
    seg = np.ones(n, np.int32)

    base = siglip_encode(
        my_params, cfg, jnp.asarray(patches), jnp.asarray(pos),
        jnp.asarray(seg), precision=PREC,
    )

    pad = 5
    patches_p = np.concatenate([patches, np.full((pad, cfg.patch_dim), 3.3, np.float32)])
    pos_p = np.concatenate([pos, np.zeros(pad, pos.dtype)])
    seg_p = np.concatenate([seg, np.zeros(pad, np.int32)])
    padded = siglip_encode(
        my_params, cfg, jnp.asarray(patches_p), jnp.asarray(pos_p),
        jnp.asarray(seg_p), precision=PREC,
    )
    np.testing.assert_allclose(
        np.asarray(padded[:n]), np.asarray(base), rtol=1e-5, atol=1e-5
    )


def test_segment_flash_matches_dense():
    """segment_flash_attention (block-sparse kernel reuse) == dense
    segment-mask attention, including padded (segment 0) rows -> zeros."""
    import jax
    import jax.numpy as jnp

    from bagel_tpu.models.siglip import segment_flash_attention
    from bagel_tpu.ops.attention import dot_attention, segment_mask

    rng = np.random.default_rng(7)
    n, h, d = 640, 4, 72  # SigLIP head_dim 72; n not a block multiple
    seg = np.zeros(n, np.int32)
    seg[:200] = 1
    seg[200:500] = 2
    seg[500:600] = 3  # trailing 40 tokens stay padding
    q = rng.standard_normal((n, h, d)).astype(np.float32)
    k = rng.standard_normal((n, h, d)).astype(np.float32)
    v = rng.standard_normal((n, h, d)).astype(np.float32)

    got = segment_flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
        interpret=True,
    )
    want = dot_attention(
        jnp.asarray(q)[None], jnp.asarray(k)[None], jnp.asarray(v)[None],
        mask=segment_mask(jnp.asarray(seg)[None]),
        precision="float32",
    )[0]
    np.testing.assert_allclose(np.asarray(got)[:600], np.asarray(want)[:600],
                               rtol=2e-5, atol=2e-5)
    assert np.abs(np.asarray(got)[600:]).max() == 0.0


def test_siglip_encode_flash_matches_dense():
    """siglip_encode attn_impl='flash' == 'dense' through the full tower
    (2-D rope + layernorms + MLP), grads included."""
    import jax
    import jax.numpy as jnp

    from bagel_tpu.configs import SiglipConfig
    from bagel_tpu.models.siglip import init_siglip_params, siglip_encode

    cfg = SiglipConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, patch_size=14, image_size=28, rope=True,
    )
    params = init_siglip_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    n = 300
    patches = jnp.asarray(
        rng.standard_normal((n, cfg.patch_dim)).astype(np.float32)
    )
    pos = jnp.asarray(rng.integers(0, 4, size=n).astype(np.int32))
    seg = np.zeros(n, np.int32)
    seg[:128] = 1
    seg[128:260] = 2
    seg = jnp.asarray(seg)

    def run(impl):
        def loss(p):
            out = siglip_encode(p, cfg, patches, pos, seg,
                                precision="float32", attn_impl=impl)
            return jnp.sum(out ** 2), out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        return l, out, g

    l_f, out_f, g_f = run("flash")
    l_d, out_d, g_d = run("dense")
    from asserts import assert_close_live, assert_grad_trees_close
    assert_close_live(out_f, out_d, floor=1e-3, rtol=1e-4, atol=1e-4,
                      name="siglip flash-vs-dense")
    assert_grad_trees_close(g_f, g_d, rtol=2e-3, atol=2e-3,
                            name="siglip grads")
