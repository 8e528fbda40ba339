"""End-to-end inference protocol parity vs the reference (CPU oracle).

Runs the reference's actual inference path — prepare_prompts ->
forward_cache_update_text (scatter-merged NaiveCache) -> prepare_start_tokens
-> generate_text (bagel.py:232-1000) — with flash_attn replaced by a CPU
varlen oracle and the inline bf16 casts neutralized, against this
framework's prefill + decode scan on converted weights. Greedy tokens must
match exactly (BASELINE fidelity gate: exact token match on the
understanding config).
"""

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
    kv_cache_init,
    llm_extend,
)
from bagel_tpu.utils.convert import convert_llm

PREC = "float32"


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
            # bottom-right-aligned causal (flash_attn semantics with cache)
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
    """Neutralize the reference's inline .to(bfloat16) casts so the oracle
    runs fp32 end-to-end (qwen2_navit.py:337-339, 555-557)."""
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


def test_greedy_decode_tokens_match_reference():
    from modeling.bagel import qwen2_navit as nav

    nav.flash_attn_varlen_func = _cpu_varlen

    cfg = tiny_qwen2(layer_module="mot")
    ref_cfg = nav.Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        qk_norm=True, layer_module="Qwen2MoTDecoderLayer",
        tie_word_embeddings=False, freeze_und=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = nav.Qwen2ForCausalLM(ref_cfg)
    model.init_moe()
    # sharpen logits so greedy argmax is decisive with random weights
    with torch.no_grad():
        model.lm_head.weight.mul_(5.0)
    model.eval()  # forward_inference path

    tok = _FakeTokenizer()
    bos, eos = 500, 501
    prompt = "what is in the picture?"

    # --- reference: prepare_prompts -> cache update -> greedy decode ------
    text_ids = [bos] + tok.encode(prompt) + [eos]
    T = len(text_ids)
    max_new = 12
    with _no_bf16_casts(), torch.no_grad():
        cache = nav.NaiveCache(cfg.num_hidden_layers)
        out = model.forward_inference(
            packed_query_sequence=model.model.embed_tokens(
                torch.tensor(text_ids)
            ),
            query_lens=torch.tensor([T], dtype=torch.int32),
            packed_query_position_ids=torch.arange(T),
            packed_query_indexes=torch.arange(T),
            past_key_values=cache,
            key_values_lens=torch.tensor([0], dtype=torch.int32),
            packed_key_value_indexes=torch.arange(0),
            update_past_key_values=True,
            is_causal=True,
            mode="und",
        )
        cache = out.past_key_values

        ref_tokens = []
        cur = torch.tensor([bos])
        kv_len = T
        pos = torch.tensor([T])
        for _ in range(max_new):
            out = model.forward_inference(
                packed_query_sequence=model.model.embed_tokens(cur),
                query_lens=torch.ones(1, dtype=torch.int32),
                packed_query_position_ids=pos,
                packed_query_indexes=torch.tensor([kv_len]),
                past_key_values=cache,
                key_values_lens=torch.tensor([kv_len], dtype=torch.int32),
                packed_key_value_indexes=torch.arange(kv_len),
                update_past_key_values=True,
                is_causal=True,
                mode="und",
            )
            cache = out.past_key_values
            logits = model.lm_head(out.packed_query_sequence)
            cur = torch.argmax(logits, dim=-1)
            ref_tokens.append(int(cur[0]))
            kv_len += 1
            pos = pos + 1

    # --- ours: converted weights, prefill + decode scan -------------------
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_llm(sd, cfg, prefix="")

    jcache = kv_cache_init(cfg, 1, 64, jnp.float32)
    ids = jnp.asarray(text_ids)[None]
    _, jcache = llm_extend(
        params, cfg, embed_tokens(params, ids), jnp.arange(T)[None], jcache,
        jnp.asarray([T]), und_len=T, causal=True, update_cache=True,
        precision=PREC,
    )
    toks, _ = decode_text(
        params, cfg, jcache, jnp.asarray([bos]), jnp.asarray([T]),
        max_steps=max_new, eos_id=-1, precision=PREC,
    )
    got = np.asarray(toks[0]).tolist()

    assert got == ref_tokens, (got, ref_tokens)
