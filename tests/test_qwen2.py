"""Qwen2 MoT decoder: invariants + golden parity vs the torch reference."""

import contextlib

import numpy as np
import pytest
import torch

import refutil  # noqa: F401

import jax
import jax.numpy as jnp

from bagel_tpu.configs import tiny_qwen2
from bagel_tpu.models.qwen2 import (
    decode_text,
    embed_tokens,
    init_qwen2_params,
    kv_cache_init,
    llm_extend,
    lm_logits,
)

PREC = "float32"


@pytest.fixture(scope="module")
def cfg():
    return tiny_qwen2(layer_module="mot")


@pytest.fixture(scope="module")
def params(cfg):
    return init_qwen2_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)


def test_prefill_then_decode_matches_full_forward(cfg, params):
    """Causal invariant: hidden state of token i must not depend on whether
    tokens after i were in the same block."""
    T = 10
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, cfg.vocab_size)
    pos = jnp.arange(T)[None, :]
    embeds = embed_tokens(params, ids)

    cache = kv_cache_init(cfg, 1, 32, dtype=jnp.float32)
    full, _ = llm_extend(
        params, cfg, embeds, pos, cache, jnp.asarray([T]),
        und_len=T, causal=True, update_cache=False, precision=PREC,
    )

    # prefill first 6, then extend one-by-one
    cache = kv_cache_init(cfg, 1, 32, dtype=jnp.float32)
    h6, cache = llm_extend(
        params, cfg, embeds[:, :6], pos[:, :6], cache, jnp.asarray([6]),
        und_len=6, causal=True, update_cache=True, precision=PREC,
    )
    np.testing.assert_allclose(np.asarray(h6), np.asarray(full[:, :6]), rtol=1e-4, atol=1e-4)
    for i in range(6, T):
        hi, cache = llm_extend(
            params, cfg, embeds[:, i : i + 1], pos[:, i : i + 1], cache,
            jnp.asarray([1]), und_len=1, causal=True, update_cache=True,
            precision=PREC,
        )
        np.testing.assert_allclose(
            np.asarray(hi[:, 0]), np.asarray(full[:, i]), rtol=1e-4, atol=1e-4,
            err_msg=f"token {i}",
        )


def test_padded_queries_do_not_affect_later_blocks(cfg, params):
    """Ragged batch: writing a padded block then continuing must equal the
    unpadded sequence."""
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    pos = jnp.arange(8)[None, :]
    embeds = embed_tokens(params, ids)

    cache = kv_cache_init(cfg, 1, 32, dtype=jnp.float32)
    _, cache = llm_extend(
        params, cfg, embeds[:, :5], pos[:, :5], cache, jnp.asarray([5]),
        und_len=5, causal=True, update_cache=True, precision=PREC,
    )
    ref_out, _ = llm_extend(
        params, cfg, embeds[:, 5:], pos[:, 5:], cache, jnp.asarray([3]),
        und_len=3, causal=True, update_cache=False, precision=PREC,
    )

    # same but the first block is padded to 7 with garbage
    cache2 = kv_cache_init(cfg, 1, 32, dtype=jnp.float32)
    pad = jnp.full((1, 2, cfg.hidden_size), 7.7, jnp.float32)
    padded = jnp.concatenate([embeds[:, :5], pad], axis=1)
    pad_pos = jnp.concatenate([pos[:, :5], jnp.zeros((1, 2), pos.dtype)], axis=1)
    _, cache2 = llm_extend(
        params, cfg, padded, pad_pos, cache2, jnp.asarray([5]),
        und_len=7, causal=True, update_cache=True, precision=PREC,
    )
    got, _ = llm_extend(
        params, cfg, embeds[:, 5:], pos[:, 5:], cache2, jnp.asarray([3]),
        und_len=3, causal=True, update_cache=False, precision=PREC,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_out), rtol=1e-4, atol=1e-4)


def test_mot_gen_expert_equals_und_at_init(cfg, params):
    """Gen weights are copies of und weights at init (init_moe semantics),
    so a mixed block must produce identical outputs to an all-und block."""
    T = 6
    x = jax.random.normal(jax.random.PRNGKey(3), (1, T, cfg.hidden_size))
    pos = jnp.full((1, T), 4, jnp.int32)
    cache = kv_cache_init(cfg, 1, 16, dtype=jnp.float32)
    out_und, _ = llm_extend(
        params, cfg, x, pos, cache, jnp.asarray([T]),
        und_len=T, causal=False, update_cache=False, precision=PREC,
    )
    out_mixed, _ = llm_extend(
        params, cfg, x, pos, cache, jnp.asarray([T]),
        und_len=2, causal=False, update_cache=False, precision=PREC,
    )
    np.testing.assert_allclose(
        np.asarray(out_mixed), np.asarray(out_und), rtol=1e-4, atol=1e-4
    )


def test_decode_early_stop_matches_scan(cfg, params):
    """while_loop early-exit decode must emit the same tokens as the
    fixed-length scan."""
    cache = kv_cache_init(cfg, 1, 64, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 7), 0, cfg.vocab_size)
    embeds = embed_tokens(params, ids)
    _, cache = llm_extend(
        params, cfg, embeds, jnp.arange(7)[None], cache, jnp.asarray([7]),
        und_len=7, causal=True, update_cache=True, precision=PREC,
    )
    kwargs = dict(max_steps=6, eos_id=2, precision=PREC)
    toks_w, _ = decode_text(params, cfg, cache, jnp.asarray([1]),
                            jnp.asarray([7]), early_stop=True, **kwargs)
    toks_s, _ = decode_text(params, cfg, cache, jnp.asarray([1]),
                            jnp.asarray([7]), early_stop=False, **kwargs)
    np.testing.assert_array_equal(np.asarray(toks_w), np.asarray(toks_s))


def test_decode_text_runs_and_stops(cfg, params):
    cache = kv_cache_init(cfg, 2, 64, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 5), 0, cfg.vocab_size)
    embeds = embed_tokens(params, ids)
    _, cache = llm_extend(
        params, cfg, embeds, jnp.arange(5)[None].repeat(2, 0), cache,
        jnp.asarray([5, 5]), und_len=5, causal=True, update_cache=True,
        precision=PREC,
    )
    toks, cache = decode_text(
        params, cfg, cache, jnp.asarray([1, 1]), jnp.asarray([5, 5]),
        max_steps=8, eos_id=2, precision=PREC,
    )
    assert toks.shape == (2, 8)
    assert int(cache.length[0]) <= 5 + 8


# ---------------------------------------------------------------------------
# Golden parity vs the torch reference MoT stack (CPU, SDPA math backend)
# ---------------------------------------------------------------------------


def _build_reference_model(cfg):
    from modeling.bagel import qwen2_navit as nav

    ref_cfg = nav.Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        qk_norm=cfg.qk_norm,
        layer_module="Qwen2MoTDecoderLayer",
        tie_word_embeddings=False,
        freeze_und=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = nav.Qwen2ForCausalLM(ref_cfg)
    model.init_moe()
    model.train()  # forward_train path (flash-free with nested masks)
    # CPU has no EFFICIENT_ATTENTION kernel: let SDPA pick the math backend,
    # and upcast the reference's inline bf16 casts back to fp32 so the oracle
    # runs end-to-end in fp32 for a tight comparison.
    nav.sdpa_kernel = lambda backends: contextlib.nullcontext()
    orig_sdpa = torch.nn.functional.scaled_dot_product_attention

    def fp32_sdpa(q, k, v, attn_mask=None, **kw):
        return orig_sdpa(
            q.float(), k.float(), v.float(),
            attn_mask.float() if attn_mask is not None else None, **kw
        )

    nav.scaled_dot_product_attention = fp32_sdpa
    return model


def _ref_state_to_pytree(model, cfg):
    """torch state_dict -> bagel_tpu stacked-layer pytree (weights transposed
    to [in, out])."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=True):
        mats = [sd[fmt.format(i)] for i in range(L)]
        arr = np.stack(mats, 0)
        if transpose and arr.ndim == 3:
            arr = arr.transpose(0, 2, 1)
        return jnp.asarray(arr)

    def attn(g=""):
        p = "model.layers.{0}.self_attn."
        return {
            "q": {"w": stack(p + "q_proj%s.weight" % g),
                  "b": stack(p + "q_proj%s.bias" % g, False)},
            "k": {"w": stack(p + "k_proj%s.weight" % g),
                  "b": stack(p + "k_proj%s.bias" % g, False)},
            "v": {"w": stack(p + "v_proj%s.weight" % g),
                  "b": stack(p + "v_proj%s.bias" % g, False)},
            "o": {"w": stack(p + "o_proj%s.weight" % g)},
            "q_norm": stack(p + "q_norm%s.weight" % g, False),
            "k_norm": stack(p + "k_norm%s.weight" % g, False),
        }

    def mlp(g=""):
        return {
            "gate": stack("model.layers.{0}.mlp%s.gate_proj.weight" % g),
            "up": stack("model.layers.{0}.mlp%s.up_proj.weight" % g),
            "down": stack("model.layers.{0}.mlp%s.down_proj.weight" % g),
        }

    layers = {
        "attn": attn(""),
        "attn_gen": attn("_moe_gen"),
        "mlp": mlp(""),
        "mlp_gen": mlp("_moe_gen"),
        "input_ln": stack("model.layers.{0}.input_layernorm.weight", False),
        "input_ln_gen": stack("model.layers.{0}.input_layernorm_moe_gen.weight", False),
        "post_ln": stack("model.layers.{0}.post_attention_layernorm.weight", False),
        "post_ln_gen": stack("model.layers.{0}.post_attention_layernorm_moe_gen.weight", False),
    }
    return {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": layers,
        "final_norm": jnp.asarray(sd["model.norm.weight"]),
        "final_norm_gen": jnp.asarray(sd["model.norm_moe_gen.weight"]),
        "lm_head": {"w": jnp.asarray(sd["lm_head.weight"].T)},
    }


@pytest.mark.parametrize("mode", ["causal_und", "full_mixed"])
def test_golden_mot_stack_vs_reference(cfg, mode):
    from data.data_utils import prepare_attention_mask_per_sample

    model = _build_reference_model(cfg)
    my_params = _ref_state_to_pytree(model, cfg)

    T = 12
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, cfg.hidden_size)).astype(np.float32)

    if mode == "causal_und":
        pos = np.arange(T, dtype=np.int64)
        mask = prepare_attention_mask_per_sample([T], ["causal"])
        und_idx = torch.arange(T)
        gen_idx = torch.arange(0)
        und_len, causal = T, True
    else:
        # block layout: 4 und tokens then 8 gen tokens, full attention,
        # all image tokens share one rope position (bagel.py:592)
        pos = np.array([0, 1, 2, 3] + [4] * 8, dtype=np.int64)
        mask = prepare_attention_mask_per_sample([T], ["full"])
        und_idx = torch.arange(0, 4)
        gen_idx = torch.arange(4, 12)
        und_len, causal = 4, False

    with torch.no_grad():
        expected = model.forward_train(
            packed_sequence=torch.from_numpy(x.copy()),
            sample_lens=[T],
            attention_mask=[mask],
            packed_position_ids=torch.from_numpy(pos),
            packed_und_token_indexes=und_idx,
            packed_gen_token_indexes=gen_idx,
        ).numpy()

    cache = kv_cache_init(cfg, 1, T, dtype=jnp.float32)
    got, _ = llm_extend(
        my_params, cfg, jnp.asarray(x)[None], jnp.asarray(pos)[None], cache,
        jnp.asarray([T]), und_len=und_len, causal=causal,
        update_cache=False, precision=PREC,
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), expected, rtol=5e-4, atol=5e-4
    )
