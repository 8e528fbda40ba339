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
import os
import re
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from bagel_tpu.configs import BagelConfig, config_to_json


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state,
    data_status: Optional[dict] = None,
    cfg: Optional[BagelConfig] = None,
):
    """Save one checkpoint. MUST be entered by every process: Orbax saves of
    multi-host sharded arrays are collective (each host writes its own
    shards) — the reference's rank-0-only consolidation (fsdp_utils.py:
    88-120) has no analogue here. Host-side JSON files are written by
    process 0 only."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:07d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        if data_status is not None:
            with open(os.path.join(path, "data_status.json"), "w") as f:
                json.dump(_jsonify(data_status), f)
        if cfg is not None:
            with open(os.path.join(path, "config.json"), "w") as f:
                f.write(config_to_json(cfg))
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


def get_latest_ckpt(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        d for d in os.listdir(ckpt_dir)
        if re.fullmatch(r"\d+", d) and
        os.path.isdir(os.path.join(ckpt_dir, d))
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
