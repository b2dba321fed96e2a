"""Checkpoint save/resume via orbax.

Parity target: the reference's single-file torch.save dict
(``solver_spec.py:336-447``): {last_epoch, last_iter, model, ema,
optimizer_and_scheduler} written to ``checkpoint/last.pth`` + epoch-tagged
copies, tolerant partial restore. Here: orbax PyTree checkpoints with the same
"last" + "<epoch>e_<iter>iter" naming, plus a JSON sidecar for host-side
scheduler state.

TPU-native addition over the reference: ``async_save=True`` hands the device
pytree to an ``ocp.AsyncCheckpointer`` — the device->host staging happens
without blocking the train loop on filesystem IO (the reference's torch.save
stalls every rank; at production param counts the d2h fetch + serialize is
seconds per save). Async saves commit atomically (orbax tmp-dir + rename).

DURABILITY CONTRACT: async-overwriting an EXISTING name deletes the old copy
synchronously and commits the replacement only from the background thread —
so callers must async-save only to fresh or expendable names (the Solver uses
ping-pong slots + unique epoch tags and saves 'last' synchronously at
preemption/exit).  The .host.json sidecar is written immediately; it only
becomes visible to ``latest_checkpoint`` once the checkpoint DIRECTORY has
committed.  Call ``wait_for_checkpoints()`` before reading a checkpoint you
just async-wrote and at process exit.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "wait_for_checkpoints",
]

_ASYNC: Optional[ocp.AsyncCheckpointer] = None


def _ckptr():
    return ocp.PyTreeCheckpointer()


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def save_checkpoint(ckpt_dir: str, name: str, state,
                    host_state: Optional[dict] = None, *,
                    async_save: bool = False) -> str:
    """Save a device pytree + host sidecar under ckpt_dir/name.

    ``async_save=True``: returns as soon as the arrays are staged; the write
    completes in a background thread (wait with ``wait_for_checkpoints``).
    Consecutive async saves serialize against each other (orbax waits for the
    previous save), which bounds in-flight memory.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if async_save:
        _async_ckptr().save(path, state, force=True)
    else:
        _ckptr().save(path, jax.device_get(state), force=True)
    if host_state is not None:
        with open(path + ".host.json", "w") as f:
            json.dump(host_state, f)
    return path


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, name: str, template=None):
    """Returns (state, host_state or None); ``template`` restores with the
    original pytree structure/dtypes when provided."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if template is not None:
        state = _ckptr().restore(path, item=jax.device_get(template))
    else:
        state = _ckptr().restore(path)
    host_state = None
    if os.path.exists(path + ".host.json"):
        with open(path + ".host.json") as f:
            host_state = json.load(f)
    return state, host_state


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Name of the newest COMMITTED checkpoint in ckpt_dir.

    Candidates: the mutable names ('last' and the solver's async ping-pong
    slots 'auto_a'/'auto_b') plus epoch-tagged '<e>e_<it>iter' directories.
    Ordered by the .host.json sidecar's last_iter when present (the async
    slots alternate, so directory names alone don't order them), falling back
    to the iteration embedded in tagged names; 'last' wins ties (it is the
    explicit final/preemption save).  Orbax tmp dirs of in-flight saves never
    match any candidate name, so only committed checkpoints are returned."""
    if not os.path.isdir(ckpt_dir):
        return None

    def tag_iter(d: str) -> int:
        try:
            return int(d.split("_")[-1].replace("iter", ""))
        except ValueError:
            return -1

    def sidecar_iter(d: str) -> Optional[int]:
        try:
            with open(os.path.join(ckpt_dir, d) + ".host.json") as f:
                return int(json.load(f).get("last_iter", -1))
        except (OSError, ValueError, TypeError):
            return None

    cands = []
    for d in os.listdir(ckpt_dir):
        if not os.path.isdir(os.path.join(ckpt_dir, d)):
            continue
        if d in ("last", "auto_a", "auto_b") or d.endswith("iter"):
            it = sidecar_iter(d)
            if it is None:
                it = tag_iter(d) if d.endswith("iter") else -1
            cands.append((it, 1 if d == "last" else 0, d))
    if not cands:
        return None
    return max(cands)[2]
