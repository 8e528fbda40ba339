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
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:07d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.wait_until_finished()
    if data_status is not None:
        with open(os.path.join(path, "data_status.json"), "w") as f:
            json.dump(_jsonify(data_status), f)
    if cfg is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(config_to_json(cfg))
    return path


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
