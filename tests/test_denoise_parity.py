"""Denoise-loop latent parity vs the reference (the BASELINE fidelity gate:
per-denoise-step latent MAE <= 1e-2 under matched seeds).

Runs the reference's ACTUAL generation protocol — prepare_prompts ->
forward_cache_update_text -> prepare_vae_latent(+_cfg) -> generate_image
(bagel.py:552-757, wired exactly as inferencer.py:98-170, flash replaced
by a CPU oracle, bf16 casts neutralized) — against this framework's
update_context_text + gen_image(init_noise=..., return_latent=True) on
converted weights, with identical initial noise, timestep schedule, and a
CFG window covering both the cfg-on and single-branch phases."""

import contextlib

import numpy as np
import pytest
import torch

import refutil  # noqa: F401

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_bagel
from bagel_tpu.inference.engine import BagelEngine
from bagel_tpu.utils.convert import convert_bagel


def _cpu_varlen(q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q,
                max_seqlen_k, causal=False):
    import torch.nn.functional as F

    outs = []
    for i in range(len(cu_seqlens_q) - 1):
        qs, qe = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
        ks, ke = int(cu_seqlens_k[i]), int(cu_seqlens_k[i + 1])
        qq = q[qs:qe].float().transpose(0, 1)[None]
        kk = k[ks:ke].float().transpose(0, 1)[None]
        vv = v[ks:ke].float().transpose(0, 1)[None]
        if causal and qq.shape[2] < kk.shape[2]:
            nq, nk = qq.shape[2], kk.shape[2]
            mask = torch.arange(nk)[None, :] <= (
                torch.arange(nq)[:, None] + (nk - nq)
            )
            o = F.scaled_dot_product_attention(
                qq, kk, vv, attn_mask=mask[None, None], enable_gqa=True
            )
        else:
            o = F.scaled_dot_product_attention(
                qq, kk, vv, is_causal=causal, enable_gqa=True
            )
        outs.append(o[0].transpose(0, 1))
    return torch.cat(outs, 0)


@contextlib.contextmanager
def _no_bf16_casts():
    orig_to = torch.Tensor.to

    def patched(self, *args, **kwargs):
        if args and args[0] is torch.bfloat16:
            return self
        if kwargs.get("dtype") is torch.bfloat16:
            kwargs = {**kwargs, "dtype": torch.float32}
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched
    try:
        yield
    finally:
        torch.Tensor.to = orig_to


class _FakeTokenizer:
    def encode(self, text):
        return [(ord(c) * 7 + 13) % 200 for c in text]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


NTID = dict(bos_token_id=500, eos_token_id=501,
            start_of_image=502, end_of_image=503)


@pytest.fixture(scope="module")
def reference_gen_bagel():
    """Reference Bagel in eval (inference-protocol) mode, gen side only."""
    from refutil import build_reference_bagel

    cfg = tiny_bagel()
    return cfg, build_reference_bagel(cfg, eval_mode=True,
                                      stub_flash=_cpu_varlen)


def test_denoise_latent_matches_reference(reference_gen_bagel):
    from modeling.bagel.qwen2_navit import NaiveCache

    cfg, model = reference_gen_bagel
    # The reference zero-initializes llm2vae (_init_weights, bagel.py:96-99),
    # which makes the random-init flow a fixed point: both latents would be
    # the unchanged init noise and this parity trivially vacuous (r4
    # finding). Randomize it (both sides inherit via state_dict conversion)
    # so the CFG combine, renorm, and integration are genuinely compared.
    with torch.no_grad():
        g = torch.Generator().manual_seed(11)
        model.llm2vae.weight.normal_(std=cfg.llm.hidden_size**-0.5,
                                     generator=g)
        model.llm2vae.bias.normal_(std=0.01, generator=g)
    L = cfg.llm.num_hidden_layers
    tok = _FakeTokenizer()
    prompt = "a cat on a mat"
    H = W = 32
    down = cfg.latent_downsample
    n = (H // down) * (W // down)
    pd = cfg.patch_latent_dim
    rng = np.random.default_rng(7)
    noise = rng.standard_normal((n, pd)).astype(np.float32)

    # timestep_shift=1.0 with 5 steps puts t=[1,.75,.5,.25]: three cfg-on
    # steps (t > 0.4) then one single-branch step — both phases covered
    knobs = dict(num_timesteps=5, timestep_shift=1.0,
                 cfg_interval=(0.4, 1.0), cfg_renorm_type="global",
                 cfg_renorm_min=0.0, cfg_text_scale=2.0, cfg_img_scale=1.0)

    # --- reference protocol (inferencer.py:98-170 wiring) -----------------
    with _no_bf16_casts(), torch.no_grad():
        cache = NaiveCache(L)
        gi, newlens, newropes = model.prepare_prompts(
            [0], [0], [prompt], tok, NTID
        )
        cache = model.forward_cache_update_text(cache, **gi)

        gi_lat = model.prepare_vae_latent(newlens, newropes, [(H, W)], NTID)
        gi_lat["packed_init_noises"] = torch.from_numpy(noise)
        cfg_cache = NaiveCache(L)  # text-CFG branch: empty context
        gi_cfg = model.prepare_vae_latent_cfg([0], [0], [(H, W)])

        unpacked = model.generate_image(
            past_key_values=cache,
            cfg_text_past_key_values=cfg_cache,
            cfg_img_past_key_values=None,
            cfg_interval=list(knobs["cfg_interval"]),
            num_timesteps=knobs["num_timesteps"],
            timestep_shift=knobs["timestep_shift"],
            cfg_renorm_type=knobs["cfg_renorm_type"],
            cfg_renorm_min=knobs["cfg_renorm_min"],
            cfg_text_scale=knobs["cfg_text_scale"],
            cfg_img_scale=knobs["cfg_img_scale"],
            **gi_lat,
            cfg_text_packed_position_ids=gi_cfg["cfg_packed_position_ids"],
            cfg_text_packed_query_indexes=gi_cfg["cfg_packed_query_indexes"],
            cfg_text_key_values_lens=gi_cfg["cfg_key_values_lens"],
            cfg_text_packed_key_value_indexes=gi_cfg[
                "cfg_packed_key_value_indexes"],
        )
        ref_latent = unpacked[0].float().numpy()

    # --- this framework on converted weights ------------------------------
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_bagel(sd, cfg)
    engine = BagelEngine(params, cfg, tok, NTID, max_kv=256)

    with jax.default_matmul_precision("float32"):
        ctx0 = engine.init_context()
        ctx = engine.update_context_text(prompt, ctx0)
        got = engine.gen_image(
            (H, W), ctx, cfg_text_precontext=ctx0,
            init_noise=noise, return_latent=True,
            **{k: v for k, v in knobs.items()},
        )

    assert got.shape == ref_latent.shape
    # vacuity guard: the reference latent must actually have moved off the
    # init noise, else the MAE bound below compares noise to noise
    from asserts import assert_close_live, assert_latent_motion
    assert_latent_motion(ref_latent, noise)
    mae = np.abs(got - ref_latent).mean()
    # BASELINE gate is 1e-2; fp32 end-to-end should sit far below it
    assert mae < 1e-2, f"fidelity gate violated: MAE={mae}"
    assert mae < 1e-3, f"unexpected drift: MAE={mae}"
    assert_close_live(got, ref_latent, moved_from=noise, rtol=5e-2,
                      atol=5e-2, name="denoise parity")
