"""Import helpers for golden tests against the PyTorch reference.

The reference at /root/reference is used *only* as a numerical oracle on CPU
(its CUDA kernels are stubbed out). Nothing is copied from it.
"""

import importlib.machinery
import sys
import types

REFERENCE = "/root/reference"


def install_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    if "flash_attn" not in sys.modules:
        fa = types.ModuleType("flash_attn")
        fa.flash_attn_varlen_func = None
        fa.__spec__ = importlib.machinery.ModuleSpec("flash_attn", None)
        sys.modules["flash_attn"] = fa


install_reference_path()


def build_reference_bagel(cfg, eval_mode=False, stub_flash=None,
                          stub_sdpa_fp32=False):
    """Construct the reference Bagel (LLM+ViT+adapters) matching a
    bagel_tpu BagelConfig — the shared builder for golden/parity tests.

    eval_mode: .eval() (forward_inference protocol) vs .train().
    stub_flash: callable replacing flash_attn_varlen_func in qwen2_navit
    AND siglip_navit (CPU oracle). stub_sdpa_fp32: force fp32 SDPA in the
    LLM train path (test_bagel_integration semantics).
    """
    import contextlib

    import torch

    from modeling.bagel import bagel as ref_bagel_mod
    from modeling.bagel import qwen2_navit as nav
    from modeling.bagel import siglip_navit as ref_vit_mod
    from modeling.autoencoder import AutoEncoderParams

    nav.sdpa_kernel = lambda backends: contextlib.nullcontext()
    if stub_flash is not None:
        nav.flash_attn_varlen_func = stub_flash
        ref_vit_mod.flash_attn_varlen_func = stub_flash
    if stub_sdpa_fp32:
        orig_sdpa = torch.nn.functional.scaled_dot_product_attention

        def fp32_sdpa(q, k, v, attn_mask=None, **kw):
            return orig_sdpa(
                q.float(), k.float(), v.float(),
                attn_mask.float() if attn_mask is not None else None, **kw
            )

        nav.scaled_dot_product_attention = fp32_sdpa

    llm_cfg = nav.Qwen2Config(
        vocab_size=cfg.llm.vocab_size,
        hidden_size=cfg.llm.hidden_size,
        intermediate_size=cfg.llm.intermediate_size,
        num_hidden_layers=cfg.llm.num_hidden_layers,
        num_attention_heads=cfg.llm.num_attention_heads,
        num_key_value_heads=cfg.llm.num_key_value_heads,
        rope_theta=cfg.llm.rope_theta,
        rms_norm_eps=cfg.llm.rms_norm_eps,
        qk_norm=True, layer_module="Qwen2MoTDecoderLayer",
        tie_word_embeddings=False, freeze_und=False,
        attn_implementation="eager",
    )
    vit_cfg = ref_vit_mod.SiglipVisionConfig(
        hidden_size=cfg.vit.hidden_size,
        intermediate_size=cfg.vit.intermediate_size,
        num_hidden_layers=cfg.vit.num_hidden_layers,
        num_attention_heads=cfg.vit.num_attention_heads,
        image_size=cfg.vit.image_size, patch_size=cfg.vit.patch_size,
        rope=True,
    )
    ae_params = AutoEncoderParams(
        resolution=256, in_channels=3, downsample=cfg.vae.downsample,
        ch=cfg.vae.ch, out_ch=3, ch_mult=list(cfg.vae.ch_mult),
        num_res_blocks=cfg.vae.num_res_blocks, z_channels=cfg.vae.z_channels,
        scale_factor=cfg.vae.scale_factor, shift_factor=cfg.vae.shift_factor,
    )
    torch.manual_seed(0)
    lm = nav.Qwen2ForCausalLM(llm_cfg)
    lm.init_moe()
    vit = ref_vit_mod.SiglipVisionModel(vit_cfg)
    vit.vision_model.embeddings.convert_conv2d_to_linear(vit_cfg)
    model = ref_bagel_mod.Bagel(lm, vit, ref_bagel_mod.BagelConfig(
        visual_gen=True, visual_und=True,
        llm_config=llm_cfg, vit_config=vit_cfg, vae_config=ae_params,
        latent_patch_size=cfg.latent_patch_size,
        max_latent_size=cfg.max_latent_size,
        vit_max_num_patch_per_side=cfg.vit_max_num_patch_per_side,
        interpolate_pos=False, timestep_shift=cfg.timestep_shift,
    ))
    model.eval() if eval_mode else model.train()
    return model
