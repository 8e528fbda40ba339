"""Checkpoint save/restore + exact data-stream resume.

Replaces FSDPCheckpoint (train/fsdp_utils.py:86-233): Orbax handles sharded
array storage natively (no rank-0 consolidation / per-shard optimizer files
needed), and the per-dataset/worker `data_status` stream positions ride
along as JSON — restoring reproduces the reference's exact-resume semantics
(SURVEY §5.3): every sample carries data_indexes, the trainer accumulates
the latest per (dataset, worker), and iterators fast-forward on restart.

Layout: <dir>/<step>/{state/  (orbax), data_status.json, config.json}
`get_latest_ckpt` mirrors train_utils.py:29-35.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from bagel_tpu.configs import BagelConfig, config_to_json


# One long-lived checkpointer per process: StandardCheckpointer saves are
# async under the hood (device->host copy happens eagerly, the disk write on
# a background thread), so the train loop only blocks for the D2H copy —
# not the multi-GB serialization. The FSDP reference has no analogue: its
# rank-0 full-state-dict consolidation (fsdp_utils.py:88-120) stalls every
# rank for the whole gather+write.
_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_saves():
    """Block until every in-flight async save has committed to disk. Call
    before reading a just-written checkpoint and at trainer exit."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state,
    data_status: Optional[dict] = None,
    cfg: Optional[BagelConfig] = None,
    block: bool = True,
):
    """Save one checkpoint. MUST be entered by every process: Orbax saves of
    multi-host sharded arrays are collective (each host writes its own
    shards) — the reference's rank-0-only consolidation (fsdp_utils.py:
    88-120) has no analogue here. Host-side JSON files are written by
    process 0 only.

    block=False returns as soon as the device->host copy is done and the
    disk write continues in the background (periodic mid-training saves);
    Orbax finalizes the `state` dir atomically (tmp-dir rename), and
    `get_latest_ckpt` ignores step dirs whose state isn't committed yet, so
    a crash mid-write can never be resumed from. Call `wait_for_saves()`
    (or save with block=True) before depending on the files."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:07d}")
    ckptr = _checkpointer()
    # serialize with any still-running previous save (Orbax requires it)
    ckptr.wait_until_finished()
    if os.path.isdir(os.path.join(path, "state")):
        # already committed for this step (e.g. the final save of a resumed
        # run that had nothing left to do) — saving again would make Orbax
        # raise on the existing destination. Loud, because if the current
        # state DIFFERS (a fresh run writing into an old ckpt_dir with a
        # colliding step counter) this skip discards it; the driver refuses
        # that layout up front (see --resume_model_only guard).
        logging.getLogger("bagel_tpu").warning(
            "checkpoint step %d already committed in %s — skipping save "
            "(pre-existing state is kept)", step, ckpt_dir
        )
        return path
    ckptr.save(os.path.join(path, "state"), state)
    if jax.process_index() == 0:
        if data_status is not None:
            with open(os.path.join(path, "data_status.json"), "w") as f:
                json.dump(_jsonify(data_status), f)
        if cfg is not None:
            with open(os.path.join(path, "config.json"), "w") as f:
                f.write(config_to_json(cfg))
    if block:
        ckptr.wait_until_finished()
    return path


def gather_data_status(data_status: dict) -> dict:
    """All-gather per-process data-stream positions before a save, so the
    checkpoint records every host's iterator state (the reference gathers
    rank dicts with gather_object, pretrain_unified_navit.py:789-808).

    Returns {process_index: data_status}. The padded-buffer JSON exchange
    lives in data.filesystem.allgather_object (one object-gather protocol
    for the whole codebase)."""
    if jax.process_count() == 1:
        return {0: data_status}
    from bagel_tpu.data.filesystem import allgather_object

    shards = allgather_object(_jsonify(data_status))
    return {r: _dejsonify(s) for r, s in enumerate(shards)}


def data_status_for_process(saved: Optional[dict], rank: int) -> dict:
    """Pick this process's slice of a saved data_status. Handles both the
    gathered {rank: status} layout and legacy single-host dicts (dataset
    names as top-level keys)."""
    if not saved:
        return {}
    if all(isinstance(k, int) for k in saved.keys()):
        return saved.get(rank, {})
    return saved if rank == 0 else {}


def restore_checkpoint(path: str, abstract_state) -> Tuple[Any, Optional[dict]]:
    """Restore into the structure/shardings of `abstract_state` (a pytree of
    jax.ShapeDtypeStruct or concrete arrays)."""
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"), abstract_state)
    ds_path = os.path.join(path, "data_status.json")
    data_status = None
    if os.path.exists(ds_path):
        with open(ds_path) as f:
            data_status = _dejsonify(json.load(f))
    return state, data_status


# Regenerated-from-config sin-cos tables: never restored, so a checkpoint
# saved at a different max_latent_size / vit grid still loads (the reference
# pops these keys before load_state_dict, fsdp_utils.py:161-164,177-178).
_POS_BUFFERS = ("vit_pos_embed", "latent_pos_embed")


def restore_params_only(
    path: str, current_params: dict, from_ema: bool = False
) -> Tuple[dict, Optional[dict]]:
    """Model-weights-only restore from a train checkpoint — the reference's
    resume_model_only / finetune_from_ema path (pretrain_unified_navit.py:
    449-466 + FSDPCheckpoint.try_load_ckpt, fsdp_utils.py:153-184):
    optimizer moments, step count and data_status all start fresh.

    Returns (params, ema_params): `params` is the checkpoint's EMA weights
    when from_ema else its raw weights; `ema_params` is the checkpoint's EMA
    tree when it has one, else None (caller seeds EMA from `params`, like
    the reference falling back to model.safetensors, fsdp_utils.py:169-173).
    The sin-cos position tables are taken from `current_params` (regenerated
    at the CURRENT config's resolution), and restored leaves adopt
    `current_params`' shardings, so the weights land on the mesh directly.
    """
    state_dir = os.path.join(path, "state")
    meta = ocp.StandardCheckpointer().metadata(state_dir).item_metadata
    has_ema = meta["ema_params"] is not None
    if from_ema and not has_ema:
        raise ValueError(
            f"--finetune_from_ema: checkpoint {path} was saved without EMA"
        )

    def want(sub_meta):
        """Abstract subtree: current shardings, pos tables skipped."""
        out = {}
        for name, group in sub_meta.items():
            if name in _POS_BUFFERS or name not in current_params:
                out[name] = jax.tree.map(lambda m: ocp.PLACEHOLDER, group)
            else:
                out[name] = jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(
                        a.shape, a.dtype, sharding=getattr(a, "sharding", None)
                    ),
                    current_params[name],
                )
        return out

    skip = lambda sub: jax.tree.map(lambda m: ocp.PLACEHOLDER, sub)  # noqa: E731
    item = {}
    for k in meta.keys():
        if k == "params" or (k == "ema_params" and has_ema):
            item[k] = want(meta[k])
        else:
            item[k] = skip(meta[k])

    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    restored = ckptr.restore(state_dir, args=ocp.args.PyTreeRestore(item=item))

    def finish(sub):
        """Fill skipped leaves (pos tables / groups absent from the current
        model) from current_params."""
        out = {}
        for name, group in sub.items():
            if name in current_params and (
                name in _POS_BUFFERS
                or any(l is ocp.PLACEHOLDER for l in jax.tree.leaves(
                    group, is_leaf=lambda x: x is ocp.PLACEHOLDER))
            ):
                out[name] = current_params[name]
            elif name in current_params:
                out[name] = group
        # groups the checkpoint lacks keep their fresh init (the reference
        # loads with strict=False, fsdp_utils.py:165)
        for name in current_params:
            out.setdefault(name, current_params[name])
        return out

    params = finish(restored["ema_params"] if from_ema else restored["params"])
    ema = finish(restored["ema_params"]) if has_ema else None
    return params, ema


def get_latest_ckpt(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        d for d in os.listdir(ckpt_dir)
        if re.fullmatch(r"\d+", d) and
        # `state` appears atomically when Orbax finalizes (tmp-dir rename):
        # a step dir without it is an in-flight/aborted async save, never a
        # resume candidate
        os.path.isdir(os.path.join(ckpt_dir, d, "state"))
    ]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=int))


def step_from_path(path: str) -> int:
    return int(os.path.basename(os.path.normpath(path)))


def update_data_status(data_status: dict, data_indexes_list) -> dict:
    """Fold a batch's data_indexes into the running per-dataset/worker
    positions (pretrain_unified_navit.py:789-794)."""
    for item in data_indexes_list:
        ds = data_status.setdefault(item["dataset_name"], {})
        ds[item["worker_id"]] = item["data_indexes"]
    return data_status


def _jsonify(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    return obj


def _dejsonify(obj):
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            key = int(k) if k.lstrip("-").isdigit() else k
            out[key] = _dejsonify(v)
        return out
    return obj
