"""Prompt-lookup speculative decoding (greedy-exact, weight-free draft).

Single-token decode on a 7B model is HBM-bandwidth-bound: every step
streams ~7 GB of und-expert weights to produce ONE token (NOTES decode-SoL
accounting). Verifying a block of K+1 tokens streams the SAME bytes — the
extra FLOPs ride along free on the MXU — so any draft with nonzero
acceptance turns bandwidth into tokens. The draft here is prompt-lookup
(n-gram) speculation: propose the K tokens that followed the most recent
earlier occurrence of the current trailing n-gram in the session's token
history. No draft weights, no training, and greedy equivalence: the verify
pass accepts exactly the prefix the full model would have produced, so
outputs are token-identical to `qwen2.decode_text` greedy decoding —
ALGORITHMICALLY exact; in low precision the K+1-wide verify matmuls may
accumulate in a different order than 1-token decode, so a near-tied argmax
can flip (the same caveat applies to any batched-vs-single decode; fp32
parity is bit-exact and is what the tests assert).

Strong on the Bagel workloads that repeat context — editing instructions,
VQA with long OCR-ish prompts, chat rewrites; graceful on prose (rejected
drafts cost one normal decode step's bandwidth).

The reference has no speculative decoding (its decode is the plain
token-by-token loop, bagel.py:930-1000); this is a beyond-reference
serving feature. Everything runs in ONE jitted lax.while_loop with static
shapes: a fixed [B, C] token-history buffer for the n-gram match, a fixed
K+1 verify block through `llm_extend`, and per-row KV-cache length
rollback for rejected tokens (the cache's `length` is [B], so rows accept
different amounts independently).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from bagel_tpu.configs import Qwen2Config
from bagel_tpu.models.qwen2 import KVCache, embed_tokens, llm_extend, lm_logits


def ngram_propose(
    ctx: jax.Array,  # [B, C] int32 token history buffer
    ctx_len: jax.Array,  # [B] tokens valid in ctx (>= n)
    n: int,
    k: int,
) -> jax.Array:
    """[B, k] draft tokens: the continuation of the latest earlier match of
    the trailing n-gram. Rows without a match get an arbitrary (stale)
    proposal — wrong drafts are merely rejected by the verify pass, so no
    separate found/not-found control flow is needed (static shapes)."""
    b, c = ctx.shape
    j = jnp.arange(c - n + 1)
    win = ctx[:, j[:, None] + jnp.arange(n)[None, :]]  # [B, C-n+1, n]
    last = jax.vmap(
        lambda row, l: lax.dynamic_slice(row, (l - n,), (n,))
    )(ctx, ctx_len)  # [B, n] trailing gram (ends at ctx_len-1)
    m = jnp.all(win == last[:, None, :], axis=-1)
    # windows fully inside the history, excluding the trailing gram itself
    m = m & (j[None, :] + n <= ctx_len[:, None] - 1)
    best = jnp.max(jnp.where(m, j[None, :], -1), axis=1)  # latest match
    start = jnp.where(best >= 0, best + n, 0)
    return jax.vmap(
        lambda row, s: lax.dynamic_slice(row, (s,), (k,))
    )(ctx, start)


def decode_text_spec(
    params: dict,
    cfg: Qwen2Config,
    cache: KVCache,
    start_tokens: jax.Array,  # [B]
    position_ids: jax.Array,  # [B] rope position of the start token
    ctx_tokens: jax.Array,  # [B, C0] consumed text ids (prompt history)
    ctx_len: jax.Array,  # [B] valid prefix of ctx_tokens
    *,
    max_steps: int,
    eos_id: int,
    draft_len: int = 7,
    ngram: int = 3,
    precision=None,
    active: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Greedy decode with prompt-lookup speculation. Token-identical output
    to `decode_text(..., do_sample=False)`; returns ([B, max_steps] tokens
    eos-padded, final cache).

    The caller must leave `draft_len + 1` KV headroom beyond what plain
    decode needs: each verify writes K+1 entries before rolling back
    (dynamic_update_slice clamps out-of-range starts, which would corrupt
    the cache silently — same capacity contract as engine prefill)."""
    b = start_tokens.shape[0]
    k = draft_len
    c0 = ctx_tokens.shape[1]
    cbuf = c0 + max_steps + k + 2  # history + start + generated + slack

    ctx = jnp.zeros((b, cbuf), jnp.int32)
    ctx = lax.dynamic_update_slice(ctx, ctx_tokens.astype(jnp.int32), (0, 0))
    # append the start token to the matchable history
    ctx = ctx.at[jnp.arange(b), ctx_len].set(start_tokens.astype(jnp.int32))
    hist_len = ctx_len + 1
    # short histories can't form an n-gram window pair; left-pad semantics:
    # matches need hist_len >= n+1, else the invalid-window mask kills all
    # candidates and the fallback draft is used (harmless).

    done0 = ~active if active is not None else jnp.zeros((b,), bool)
    out0 = jnp.full((b, max_steps + k + 1), eos_id, start_tokens.dtype)
    rows = jnp.arange(b)

    def cond(state):
        _, _, _, done, _, out_len, _, _ = state
        return ~jnp.all(done | (out_len >= max_steps))

    def body(state):
        cache, cur, pos, done, out, out_len, ctx, hist_len = state
        draft = ngram_propose(ctx, hist_len, ngram, k)  # [B, k]
        block = jnp.concatenate(
            [cur[:, None].astype(jnp.int32), draft], axis=1
        )  # [B, k+1]
        embeds = embed_tokens(params, block)
        posb = pos[:, None] + jnp.arange(k + 1)[None, :]
        live = ~(done | (out_len >= max_steps))
        qv = jnp.where(live, k + 1, 0).astype(jnp.int32)
        hidden, cache = llm_extend(
            params, cfg, embeds, posb, cache, qv,
            und_len=k + 1, causal=True, update_cache=True,
            precision=precision,
        )
        logits = lm_logits(
            params, hidden.reshape(b * (k + 1), -1), precision
        )
        y = jnp.argmax(logits, axis=-1).reshape(b, k + 1).astype(jnp.int32)

        # longest accepted draft prefix, then truncate at the first eos
        acc = jnp.cumprod(
            (draft == y[:, :k]).astype(jnp.int32), axis=1
        )  # [B, k]
        a = jnp.sum(acc, axis=1)  # accepted drafts in [0, k]
        jj = jnp.arange(k + 1)[None, :]
        emit_window = jj <= a[:, None]
        is_eos = (y == eos_id) & emit_window
        e = jnp.where(
            jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), k
        )
        n_emit = jnp.where(live, jnp.minimum(a, e) + 1, 0)  # [B]
        # never emit (or keep cache entries) past the step budget: chunked
        # callers (serving runtime) rely on out_len <= max_steps and on the
        # cache holding exactly the delivered tokens
        n_emit = jnp.minimum(n_emit, jnp.maximum(max_steps - out_len, 0))

        # scatter emitted tokens into out and the history buffer
        emit_m = jj < n_emit[:, None]
        ocols = jnp.where(
            emit_m, out_len[:, None] + jj, out.shape[1]
        )  # OOB -> dropped
        out = out.at[rows[:, None], ocols].set(
            y.astype(out.dtype), mode="drop"
        )
        ccols = jnp.where(emit_m, hist_len[:, None] + jj, ctx.shape[1])
        ctx = ctx.at[rows[:, None], ccols].set(y, mode="drop")

        # roll back rejected cache entries: the block wrote k+1, only
        # n_emit inputs (cur + accepted drafts) were really consumed
        cache = KVCache(
            k=cache.k, v=cache.v,
            length=cache.length - jnp.where(live, (k + 1) - n_emit, 0),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )

        last = jnp.maximum(n_emit - 1, 0)
        nxt = jnp.where(live, y[rows, last], cur.astype(jnp.int32))
        hit_eos = live & (y[rows, last] == eos_id)
        done = done | hit_eos
        out_len = out_len + n_emit
        return (cache, nxt, pos + n_emit, done, out, out_len, ctx,
                hist_len + n_emit)

    state = (
        cache, start_tokens.astype(jnp.int32), position_ids, done0, out0,
        jnp.zeros((b,), jnp.int32), ctx, hist_len,
    )
    cache, _, _, _, out, _, _, _ = lax.while_loop(cond, body, state)
    return out[:, :max_steps], cache


@partial(
    jax.jit,
    static_argnames=("cfg", "max_steps", "eos_id", "draft_len", "ngram"),
)
def decode_text_spec_jit(params, cfg, cache, start, pos, ctx_tokens,
                         ctx_len, *, max_steps, eos_id, draft_len=7,
                         ngram=3):
    return decode_text_spec(
        params, cfg, cache, start, pos, ctx_tokens, ctx_len,
        max_steps=max_steps, eos_id=eos_id, draft_len=draft_len,
        ngram=ngram,
    )
