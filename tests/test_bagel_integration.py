"""Full-model integration golden test.

Builds the reference Bagel (LLM+ViT+adapters) on CPU, converts its state
dict through bagel_tpu.utils.convert, and compares the complete packed
training forward (CE + MSE per element) under matched noise. This exercises
the checkpoint converter, the packed-sequence assembly, the MoT train path,
the ViT tower, the adapters and the loss plumbing in one shot.
"""

import contextlib

import numpy as np
import pytest
import torch

import refutil  # noqa: F401

import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.models.bagel import PackedTrainBatch, bagel_forward_train, patchify_latent
from bagel_tpu.utils.convert import convert_bagel

PREC = "float32"


def _cpu_varlen_attention(q, k, v, cu_seqlens_q, cu_seqlens_k,
                          max_seqlen_q, max_seqlen_k, causal=False):
    import torch.nn.functional as F

    outs = []
    for i in range(len(cu_seqlens_q) - 1):
        s, e = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
        o = F.scaled_dot_product_attention(
            q[s:e].float().transpose(0, 1)[None],
            k[s:e].float().transpose(0, 1)[None],
            v[s:e].float().transpose(0, 1)[None],
            is_causal=causal,
        )
        outs.append(o[0].transpose(0, 1))
    return torch.cat(outs, 0)


@pytest.fixture(scope="module")
def reference_bagel():
    from refutil import build_reference_bagel

    cfg = tiny_bagel()
    model = build_reference_bagel(cfg, stub_flash=_cpu_varlen_attention,
                                  stub_sdpa_fp32=True)
    return cfg, model


def test_full_train_forward_matches_reference(reference_bagel):
    from data.data_utils import (
        get_flattened_position_ids_extrapolate,
        patchify,
        prepare_attention_mask_per_sample,
    )

    cfg, model = reference_bagel
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # strip the Bagel prefix-less names (state dict is already flat)
    my_params = convert_bagel(sd, cfg)

    rng = np.random.default_rng(0)
    n_text = 8
    vit_hw, vae_hw = (28, 28), (32, 32)
    p_vit = cfg.vit.patch_size
    n_vit = (vit_hw[0] // p_vit) * (vit_hw[1] // p_vit)
    down = cfg.latent_downsample
    h, w = vae_hw[0] // down, vae_hw[1] // down
    n_vae = h * w
    total = n_text + n_vit + n_vae

    text_ids = rng.integers(0, cfg.llm.vocab_size, n_text)
    labels = rng.integers(0, cfg.llm.vocab_size, n_text - 1)
    vit_img = rng.standard_normal((3,) + vit_hw).astype(np.float32) * 0.4
    latent = rng.standard_normal(
        (cfg.vae.z_channels, vae_hw[0] // cfg.vae.downsample,
         vae_hw[1] // cfg.vae.downsample)
    ).astype(np.float32)
    noise = rng.standard_normal((n_vae, cfg.patch_latent_dim)).astype(np.float32)
    raw_t = np.float32(0.3)

    vit_tokens = patchify(torch.from_numpy(vit_img), p_vit)
    vit_pos = get_flattened_position_ids_extrapolate(
        *vit_hw, p_vit, cfg.vit_max_num_patch_per_side
    )
    vae_pos = get_flattened_position_ids_extrapolate(
        *vae_hw, down, cfg.max_latent_size
    )

    position_ids = np.concatenate([
        np.arange(n_text), np.full(n_vit, n_text), np.full(n_vae, n_text + 1),
    ])
    mask = prepare_attention_mask_per_sample(
        [n_text, n_vit, n_vae], ["causal", "full", "noise"]
    )

    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x: torch.from_numpy(noise).to(x.dtype)
    try:
        with torch.no_grad():
            ref_out = model.forward(
                sequence_length=total,
                packed_text_ids=torch.from_numpy(text_ids),
                packed_text_indexes=torch.arange(n_text),
                sample_lens=[total],
                packed_position_ids=torch.from_numpy(position_ids),
                nested_attention_masks=[mask],
                ce_loss_indexes=torch.arange(n_text - 1),
                packed_label_ids=torch.from_numpy(labels),
                packed_vit_tokens=vit_tokens,
                packed_vit_token_indexes=torch.arange(n_text, n_text + n_vit),
                packed_vit_position_ids=vit_pos,
                vit_token_seqlens=torch.tensor([n_vit], dtype=torch.int32),
                padded_latent=torch.from_numpy(latent)[None],
                patchified_vae_latent_shapes=[(h, w)],
                packed_latent_position_ids=vae_pos,
                packed_vae_token_indexes=torch.arange(n_text + n_vit, total),
                packed_timesteps=torch.full((n_vae,), raw_t),
                mse_loss_indexes=torch.arange(n_text + n_vit, total),
            )
    finally:
        torch.randn_like = orig_randn_like

    # --- my side ---
    seq_len = total + 1  # +1 sink slot
    document_id = np.zeros(seq_len, np.int32)
    document_id[:total] = 1
    fan_id = np.full(seq_len, -1, np.int32)
    fan_id[n_text : n_text + n_vit] = 1
    fan_id[n_text + n_vit : total] = 2
    noise_id = np.full(seq_len, -1, np.int32)
    noise_id[n_text + n_vit : total] = 2
    gen_mask = np.zeros(seq_len, bool)
    gen_mask[n_text + n_vit : total] = True
    pos_full = np.zeros(seq_len, np.int32)
    pos_full[:total] = position_ids

    vae_patches = patchify_latent(
        jnp.asarray(latent.transpose(1, 2, 0)), cfg.latent_patch_size
    )

    batch = PackedTrainBatch(
        text_ids=jnp.asarray(text_ids, jnp.int32),
        text_idx=jnp.arange(n_text, dtype=jnp.int32),
        vit_patches=jnp.asarray(vit_tokens.numpy()),
        vit_pos_ids=jnp.asarray(vit_pos.numpy()),
        vit_seg_ids=jnp.ones(n_vit, jnp.int32),
        vit_idx=jnp.arange(n_text, n_text + n_vit, dtype=jnp.int32),
        vae_patches=vae_patches,
        vae_pos_ids=jnp.asarray(vae_pos.numpy()),
        vae_idx=jnp.arange(n_text + n_vit, total, dtype=jnp.int32),
        vae_timesteps=jnp.full((n_vae,), raw_t),
        position_ids=jnp.asarray(pos_full),
        document_id=jnp.asarray(document_id),
        fan_id=jnp.asarray(fan_id),
        noise_id=jnp.asarray(noise_id),
        gen_mask=jnp.asarray(gen_mask),
        ce_idx=jnp.arange(n_text - 1, dtype=jnp.int32),
        ce_labels=jnp.asarray(labels, jnp.int32),
        ce_weight=jnp.ones(n_text - 1),
        mse_weight=jnp.ones(n_vae),
    )

    outs = bagel_forward_train(
        my_params, cfg, batch, jnp.asarray(noise), precision=PREC
    )

    ref_ce = ref_out["ce"].numpy()
    ref_mse = ref_out["mse"].numpy()
    got_ce = np.asarray(outs["ce"])
    got_mse = np.asarray(outs["mse"])

    assert got_mse.shape == ref_mse.shape
    # ViT tower quantizes q/k/v to bf16 inside the reference flash call —
    # everything else is fp32; allow bf16-level tolerance with a tight MAE.
    np.testing.assert_allclose(got_ce, ref_ce, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(got_mse, ref_mse, rtol=5e-2, atol=5e-2)
    assert np.abs(got_ce - ref_ce).mean() < 5e-3
    assert np.abs(got_mse - ref_mse).mean() < 5e-3
