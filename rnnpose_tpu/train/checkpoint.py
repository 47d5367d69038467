"""Checkpointing with manifest semantics.

Re-design of the reference `torchplus/train/checkpoint.py`: JSON manifest
(`checkpoints.json`) with latest/all checkpoint names, step-suffixed
directories, max_to_keep pruning, restore of net AND optimizer state, and
interrupt-safe writes (the reference defers SIGINT around torch.save,
lines 10-22; orbax writes atomically via tmp-dir rename, which is stronger).

Format: orbax `PyTreeCheckpointer` over {params, opt_state, step}.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "latest_checkpoint",
    "restore_checkpoint",
    "try_restore_latest",
]

_MANIFEST = "checkpoints.json"


def _manifest_path(model_dir: str) -> str:
    return os.path.join(model_dir, _MANIFEST)


def _read_manifest(model_dir: str) -> Dict[str, Any]:
    p = _manifest_path(model_dir)
    if not os.path.exists(p):
        return {"latest_ckpt": None, "all_ckpts": []}
    with open(p) as f:
        return json.load(f)


def _write_manifest(model_dir: str, m: Dict[str, Any]):
    tmp = _manifest_path(model_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2)
    os.replace(tmp, _manifest_path(model_dir))


def save_checkpoint(
    model_dir: str,
    state: Dict[str, Any],
    step: int,
    name: str = "rnnpose",
    max_to_keep: int = 8,
) -> str:
    """Write `{name}-{step}` under model_dir, update manifest, prune.

    `state` should contain params + opt_state (+ anything else); the step is
    stored alongside so resume restores the global step exactly like the
    reference's global_step buffer riding the checkpoint
    (`model/RNNPose.py:84-94`).
    """
    os.makedirs(model_dir, exist_ok=True)
    ckpt_name = f"{name}-{step}"
    path = os.path.abspath(os.path.join(model_dir, ckpt_name))
    ckptr = ocp.PyTreeCheckpointer()
    # Multi-process: orbax `save` is COLLECTIVE (internal
    # sync_global_devices barriers; primary host writes, the rest
    # participate) — EVERY process must call it, over shared storage, or
    # the barrier names desync and training crashes. Only the
    # manifest/pruning below is primary-only.
    ckptr.save(path, dict(state, step=step), force=True)
    if jax.process_index() != 0:
        return path

    m = _read_manifest(model_dir)
    m["all_ckpts"] = [c for c in m.get("all_ckpts", []) if c != ckpt_name]
    m["all_ckpts"].append(ckpt_name)
    m["latest_ckpt"] = ckpt_name
    while len(m["all_ckpts"]) > max_to_keep:
        victim = m["all_ckpts"].pop(0)
        vpath = os.path.join(model_dir, victim)
        if os.path.isdir(vpath):
            shutil.rmtree(vpath, ignore_errors=True)
    _write_manifest(model_dir, m)
    return path


def latest_checkpoint(model_dir: str, name: str = "rnnpose") -> Optional[str]:
    """Path of the newest checkpoint per the manifest, or None."""
    m = _read_manifest(model_dir)
    latest = m.get("latest_ckpt")
    if latest is None or not latest.startswith(name):
        cands = [c for c in m.get("all_ckpts", []) if c.startswith(name)]
        if not cands:
            return None
        latest = cands[-1]
    path = os.path.join(model_dir, latest)
    return os.path.abspath(path) if os.path.isdir(path) else None


def restore_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Restore a checkpoint; with `target` given, restores with its pytree
    structure/shardings (required on multi-host)."""
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(item=dict(target, step=0))
        )
    return ckptr.restore(path)


def try_restore_latest(
    model_dir: str, target: Optional[Dict[str, Any]] = None, name: str = "rnnpose"
):
    """Reference `try_restore_latest_checkpoints` semantics
    (`torchplus/train/checkpoint.py:149-218`): restore if present, else None."""
    path = latest_checkpoint(model_dir, name)
    if path is None:
        return None
    return restore_checkpoint(path, target)
