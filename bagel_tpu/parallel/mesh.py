"""Device mesh + GSPMD sharding rules.

Replaces the reference's entire distributed runtime (train/fsdp_utils.py
FSDP HYBRID_SHARD over a (replicate, shard) device mesh + NCCL collectives;
app.py accelerate device_map) with sharding annotations over one mesh:

  axes = ("dp", "fsdp", "tp")
  - dp:   data parallel — batch dim of activations; pure replication of
          weights (the reference's HYBRID_SHARD replicate dim / DCN axis).
  - fsdp: parameter sharding along the *input/feature* dim of weights —
          ZeRO-3-equivalent; XLA all-gathers weights at use and
          reduce-scatters grads (rides ICI).
  - tp:   megatron-style tensor parallel along heads / FFN-intermediate
          (the reference has none — TP is an extension, SURVEY §2.6).

Weights get NamedSharding from rule tables keyed on pytree paths; everything
not matched is replicated. GSPMD propagates activation shardings from
weights; the train step additionally constrains the batch dim to "dp".
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp")


def make_mesh(
    shape: Optional[Tuple[int, int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (dp, fsdp, tp) mesh. Default: all devices on fsdp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n, 1)
    assert int(np.prod(shape)) == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


# (path regex, PartitionSpec) — first match wins. Paths look like
# "llm/layers/attn/q/w", "vit/layers/mlp/fc1/b", "llm/embed", ...
_PARAM_RULES = [
    # LLM stacked layers: leading L axis unsharded. qkv/gate_up are the
    # fused projection leaves (models/qwen2.fuse_llm_params) — output dim
    # last, same spec as their unfused counterparts.
    (r"llm/layers/attn(_gen)?/(q|k|v|qkv)/w", P(None, "fsdp", "tp")),
    (r"llm/layers/attn(_gen)?/(q|k|v|qkv)/b", P(None, "tp")),
    (r"llm/layers/attn(_gen)?/o/w", P(None, "tp", "fsdp")),
    (r"llm/layers/mlp(_gen)?/(gate|up|gate_up)", P(None, "fsdp", "tp")),
    (r"llm/layers/mlp(_gen)?/down", P(None, "tp", "fsdp")),
    (r"llm/embed", P("tp", "fsdp")),
    (r"llm/lm_head/w", P("fsdp", "tp")),
    # ViT stacked layers
    (r"vit/layers/attn/(q|k|v)/w", P(None, "fsdp", "tp")),
    (r"vit/layers/attn/(q|k|v)/b", P(None, "tp")),
    (r"vit/layers/attn/o/w", P(None, "tp", "fsdp")),
    (r"vit/layers/mlp/fc1/w", P(None, "fsdp", "tp")),
    (r"vit/layers/mlp/fc1/b", P(None, "tp")),
    (r"vit/layers/mlp/fc2/w", P(None, "tp", "fsdp")),
    (r"vit/patch_embed/w", P(None, "fsdp")),
    # adapters
    (r"connector/fc1/w", P("fsdp", "tp")),
    (r"connector/fc2/w", P("tp", "fsdp")),
    (r"time_embed/fc1/w", P(None, "tp")),
    (r"time_embed/fc2/w", P("tp", "fsdp")),
    (r"vae2llm/w", P(None, "fsdp")),
    (r"llm2vae/w", P("fsdp", None)),
    # everything else (norms, biases, vae convs, pos tables): replicated
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec(path, leaf, pipeline_axis=None) -> P:
    s = _path_str(path)
    if pipeline_axis is not None:
        # pipeline parallelism: LLM layer stacks shard their leading L axis
        # over the stage axis (contiguous L/pp chunks == the stage-major
        # [pp, L/pp, ...] layout parallel/pipeline.py reshapes into, so the
        # shard_map picks the local stage up with zero communication);
        # everything else replicates.
        if re.search(r"llm/layers/", s):
            return P(pipeline_axis)
        return P()
    for pattern, spec in _PARAM_RULES:
        if re.search(pattern, s):
            # drop trailing axes the leaf doesn't have (e.g. stacked vs not)
            if len(spec) > leaf.ndim:
                spec = P(*spec[: leaf.ndim])
            return spec
    return P()


def param_shardings(mesh: Mesh, params, pipeline_axis=None):
    """NamedSharding pytree matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_pspec(path, leaf, pipeline_axis)
        ),
        params,
    )


def shard_params(mesh: Mesh, params, pipeline_axis=None):
    """Place a parameter pytree onto the mesh per the rule table."""
    shardings = param_shardings(mesh, params, pipeline_axis)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh):
    """Leading-axis dp sharding for per-sample batch arrays."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
