"""Layer-module variants (dense / moe / mot), video sampling, loader."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_qwen2
from bagel_tpu.models.qwen2 import (
    embed_tokens,
    init_qwen2_params,
    kv_cache_init,
    llm_extend,
    llm_forward_train,
)
from bagel_tpu.ops.attention import train_packed_mask


@pytest.mark.parametrize("variant", ["dense", "moe", "mot"])
def test_layer_variants_forward(variant):
    """All three reference layer modules (qwen2_navit.py:936-940) run in both
    inference and train paths."""
    cfg = tiny_qwen2(layer_module=variant)
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    assert ("mlp_gen" in params["layers"]) == (variant in ("moe", "mot"))
    assert ("attn_gen" in params["layers"]) == (variant == "mot")

    T = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.hidden_size))
    cache = kv_cache_init(cfg, 1, 16, jnp.float32)
    out, _ = llm_extend(
        params, cfg, x, jnp.arange(T)[None], cache, jnp.asarray([T]),
        und_len=4, causal=False, update_cache=False, precision="float32",
    )
    assert bool(jnp.isfinite(out).all())

    gen_mask = jnp.asarray([False] * 4 + [True] * 4)
    doc = jnp.ones(T, jnp.int32)
    fan = jnp.asarray([-1] * 4 + [1] * 4, jnp.int32)
    noi = jnp.asarray([-1] * 4 + [1] * 4, jnp.int32)
    mask = train_packed_mask(doc, fan, noi)
    out = llm_forward_train(
        params, cfg, x[0], jnp.arange(T), mask, gen_mask, precision="float32"
    )
    assert bool(jnp.isfinite(out).all())


def test_frame_sampler_from_dir(tmp_path):
    from bagel_tpu.data.video import FrameSampler, sample_frame_indexes

    rng = np.random.default_rng(0)
    for i in range(12):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(tmp_path / f"f{i:03d}.png")
    fs = FrameSampler(num_frames=4, max_fps=2.0)
    frames, idx = fs.sample_with_indexes(str(tmp_path))
    assert len(frames) == len(idx) <= 4
    assert idx == sorted(idx)
    assert sample_frame_indexes(100, 30.0, 8, max_fps=2.0)[0] == 0


def test_prefetch_loader(tmp_path):
    from bagel_tpu.configs import micro_bagel
    from bagel_tpu.data.loader import PrefetchLoader
    from bagel_tpu.data.packing import (
        HostBatch, PackerConfig, SequenceBuilder, finalize,
    )
    from bagel_tpu.data.tokenizer import MockTokenizer
    from bagel_tpu.models.bagel import init_bagel_params

    cfg = micro_bagel()
    tok = MockTokenizer(cfg.llm.vocab_size)
    pcfg = PackerConfig(
        vae_image_downsample=cfg.latent_downsample,
        max_latent_size=cfg.max_latent_size,
        vit_patch_size=cfg.vit.patch_size,
        max_num_patch_per_side=cfg.vit_max_num_patch_per_side,
    )
    rng = np.random.default_rng(0)

    def host_batches():
        for i in range(3):
            b = SequenceBuilder(pcfg, tok.new_token_ids)
            b.pack_sample(dict(
                image_tensor_list=[rng.standard_normal((16, 16, 3)).astype(np.float32)],
                text_ids_list=[[5, 6, 7]],
                num_tokens=19,
                sequence_plan=[
                    dict(type="text", enable_cfg=0, loss=1,
                         special_token_loss=0, special_token_label=None),
                    dict(type="vae_image", enable_cfg=0, loss=1,
                         special_token_loss=0, special_token_label=None),
                ],
                data_indexes=dict(data_indexes=i, worker_id=0,
                                  dataset_name="toy"),
            ))
            yield finalize(b, seq_bucket=64, vit_patch_dim=cfg.vit.patch_dim,
                           patch_latent_dim=cfg.patch_latent_dim)

    params = init_bagel_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    loader = PrefetchLoader(host_batches(), params["vae"], cfg,
                            jax.random.PRNGKey(1))
    batches = [next(loader) for _ in range(3)]
    assert len(batches) == 3
    batch, idxs = batches[0]
    assert idxs[0]["dataset_name"] == "toy"
    # vae_patches were filled on device (nonzero where image tokens exist)
    assert float(jnp.abs(batch.vae_patches).max()) > 0
    loader.stop()
