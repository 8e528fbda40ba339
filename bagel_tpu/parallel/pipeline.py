"""GPipe-style pipeline parallelism over the MoT decoder stack.

Beyond-reference scaling axis (the reference has no pipeline parallelism —
SURVEY §2.6 lists PP as absent; its closest analogue is accelerate's
layer-granular *placement* at inference, app.py:75-113, which is not
pipelined). TPU-native formulation:

- The stacked per-layer weight pytree ``[L, ...]`` is reshaped to
  ``[pp, L/pp, ...]`` and sharded over a ``pp`` mesh axis via shard_map —
  each device holds a contiguous stage of ``L/pp`` layers.
- Microbatches (the rows of a stacked packed train batch) flow through the
  stages with ``lax.ppermute``: at pipeline tick ``t`` stage ``s`` runs
  microbatch ``t - s``. A scan over ``B + pp - 1`` ticks realises the
  GPipe schedule, bubbles included; ppermute's transpose is the reverse
  rotation, so ``jax.grad`` through the whole pipeline just works.
- All stages run in lockstep on identical programs (SPMD): stage identity
  comes from ``lax.axis_index``, microbatch constants (mask metadata, rope
  tables, modality masks) are replicated and fetched per tick with a
  dynamic index.

Composition: the pp axis composes with data parallelism (shard the
microbatch dim over a second mesh axis outside this function). It does NOT
compose with fsdp/tp sharding *inside* a stage — within shard_map there is
no GSPMD auto-partitioning, and stage-internal tensor parallelism would
need manual collectives. For BAGEL's 14B that is the right trade: tp/fsdp
over ICI handles single-pod serving/training; pp is the cross-pod (DCN)
axis where its point-to-point sends are cheapest (scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from bagel_tpu.configs import Qwen2Config
from bagel_tpu.ops.attention import dot_attention
from bagel_tpu.ops.norms import rms_norm
from bagel_tpu.ops.rope import rope_cos_sin


def stage_layers(params_layers, pp: int):
    """[L, ...] stacked layer pytree -> [pp, L/pp, ...] stage-major."""
    L = jax.tree_util.tree_leaves(params_layers)[0].shape[0]
    assert L % pp == 0, f"{L} layers not divisible into {pp} stages"
    return jax.tree.map(
        lambda a: a.reshape((pp, L // pp) + a.shape[1:]), params_layers
    )


def pipeline_llm_forward_train(
    params: dict,
    cfg: Qwen2Config,
    seqs: jax.Array,  # [B, S, d] assembled microbatch embeddings
    position_ids: jax.Array,  # [B, S]
    gen_masks: jax.Array,  # [B, S] bool
    masks: Optional[jax.Array],  # [B, S, S] bool dense train masks
    mesh: Mesh,
    axis: str = "pp",
    precision=None,
    remat: bool = True,
    mask_meta=None,  # (doc_id, fan_id, noise_id) each [B, S]; chunked attn
    attn_chunk: Optional[int] = None,
) -> jax.Array:
    """Pipelined packed training forward over B microbatches.

    Equivalent to vmapping llm_forward_train over the batch (exact same
    math — tests/test_pipeline.py checks gradient parity), but with the
    layer stack sharded over the ``axis`` mesh dimension. Returns final
    hidden states [B, S, d] (post final-norm, expert-selected), replicated
    across the pp axis.
    """
    from bagel_tpu.models import qwen2

    pp = mesh.shape[axis]
    B = seqs.shape[0]
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)
    staged = stage_layers(params["layers"], pp)
    eps = cfg.rms_norm_eps

    def freeze_und(x, gm):
        if cfg.freeze_und:
            return jnp.where(gm[:, None], x, lax.stop_gradient(x))
        return x

    seqs = jax.vmap(freeze_und)(seqs, gen_masks)

    if attn_chunk is not None:
        assert mask_meta is not None, "attn_chunk needs (doc, fan, noise)"
        consts = mask_meta
    else:
        assert masks is not None
        consts = (masks,)

    def stage_prog(staged_local, seqs, cos, sin, gen_masks, *consts):
        local = jax.tree.map(lambda a: a[0], staged_local)  # [L/pp, ...]
        stage = lax.axis_index(axis)
        ticks = B + pp - 1

        def run_stage(x, m):
            mc = jnp.clip(m, 0, B - 1)
            gm = gen_masks[mc]
            c, s_ = cos[mc], sin[mc]
            if attn_chunk is not None:
                from bagel_tpu.ops.chunked import chunked_packed_attention

                doc, fan, noi = (c_[mc] for c_ in consts)

                def attend(q, k, v):
                    return chunked_packed_attention(
                        q, k, v, doc, fan, noi, chunk=attn_chunk,
                        precision=precision,
                    )
            else:
                mask = consts[0][mc]

                def attend(q, k, v):
                    return dot_attention(
                        q[None], k[None], v[None], mask=mask[None],
                        precision=precision,
                    )[0]

            def layer(xc, lp):
                return qwen2.train_layer_block(
                    cfg, lp, xc, attend, gm, c, s_, precision
                ), None

            from bagel_tpu.models.qwen2 import remat_wrap

            layer = remat_wrap(layer, remat)
            y, _ = lax.scan(layer, x, local)
            return y

        def tick(carry, t):
            h_prev, outputs = carry
            m = t - stage  # microbatch this stage handles at tick t
            x0 = seqs[jnp.clip(m, 0, B - 1)]
            # stage 0 draws fresh microbatches; others consume the
            # neighbor's output handed over at the previous tick
            x = jnp.where(stage == 0, x0, h_prev)
            y = run_stage(x, m)
            # the final stage records finished microbatches (bubble ticks
            # compute garbage on clamped inputs and are simply not written)
            write = (stage == pp - 1) & (m >= 0) & (m < B)
            outputs = jnp.where(
                write, outputs.at[jnp.clip(m, 0, B - 1)].set(y), outputs
            )
            h_next = lax.ppermute(
                y, axis, [(i, (i + 1) % pp) for i in range(pp)]
            )
            return (h_next, outputs), None

        init = (jnp.zeros_like(seqs[0]), jnp.zeros_like(seqs))
        (_, outputs), _ = lax.scan(tick, init, jnp.arange(ticks))
        # outputs live on the last stage only; psum of the one-hot stage
        # mask replicates them everywhere (device-invariant => out_specs P())
        return lax.psum(
            jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)),
            axis,
        )

    layer_spec = jax.tree.map(
        lambda a: P(axis, *([None] * (len(a.shape) - 1))), staged
    )
    repl = P()
    hidden = jax.shard_map(
        stage_prog,
        mesh=mesh,
        in_specs=(layer_spec, repl, repl, repl, repl)
        + tuple(repl for _ in consts),
        out_specs=repl,
        check_vma=False,
    )(staged, seqs, cos, sin, gen_masks, *consts)

    # final norm + expert select, replicated (identical on every device)
    def final(x, gm):
        if cfg.use_moe:
            und = rms_norm(x, params["final_norm"], eps)
            if cfg.freeze_und:
                und = jnp.where(gm[:, None], und, lax.stop_gradient(und))
            out = jnp.where(
                gm[:, None],
                rms_norm(x, params["final_norm_gen"], eps),
                und,
            )
        else:
            out = rms_norm(x, params["final_norm"], eps)
        return out

    return jax.vmap(final)(hidden, gen_masks)
