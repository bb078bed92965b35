"""Checkpoint / resume via Orbax (reference learning_dmpo.py:160-243).

Supports full save/restore of the training LoopState and the reference's
partial-restore modes: policy-only ("snapshot" analog) and decoder-only
restore + freeze for skill transfer (reference learning_dmpo.py:236-243).
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any, step: int | None = None):
    """Save a pytree checkpoint (train state or full loop state)."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"ckpt_{step}")
    _ckptr().save(path, jax.device_get(state), force=True)
    return path


def restore(path: str, template: Any) -> Any:
    """Restore into the structure of `template`."""
    import orbax.checkpoint as ocp
    restored = _ckptr().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(jax.device_get(template)))
    return jax.tree.map(
        lambda t, r: jax.numpy.asarray(r, getattr(t, "dtype", None)),
        template, restored)


def restore_policy_only(path: str, train_state):
    """Load only policy params from a checkpoint of a TrainState."""
    full = restore(path, train_state)
    return train_state.replace(
        policy_params=full.policy_params,
        target_policy_params=full.target_policy_params)


def restore_policy_params(path: str):
    """Restore just the policy params pytree from a checkpoint, without a
    template (teacher loading for kickstarting / decoder donor for
    transfer; reference learning_dmpo.py:213-243)."""
    raw = _ckptr().restore(os.path.abspath(path))
    node = raw
    if isinstance(node, dict) and "train" in node:
        node = node["train"]
    if isinstance(node, dict) and "policy_params" in node:
        node = node["policy_params"]
    return node


def latest(path: str) -> str | None:
    """Most recent COMPLETED ckpt_* directory under path, if any.
    Skips orbax in-progress tmp dirs (ckpt_N.orbax-checkpoint-tmp...)
    left by an interrupted save."""
    if not os.path.isdir(path):
        return None
    cands = []
    for d in os.listdir(path):
        if not d.startswith("ckpt_"):
            continue
        suffix = d.split("_", 1)[1]
        if suffix.isdigit():
            cands.append((int(suffix), d))
    if not cands:
        return None
    return os.path.join(path, max(cands)[1])


class PeriodicCheckpointer:
    """Time-based saving (reference Checkpointer, time_delta_minutes)."""

    def __init__(self, directory: str, time_delta_minutes: float = 30.0):
        self.directory = directory
        self.delta = time_delta_minutes * 60.0
        self._last = time.time()

    def due(self) -> bool:
        """Check BEFORE materializing the state: callers must not pay a
        device_get of the full loop state (the replay ring is GBs) on
        iterations that won't save."""
        return time.time() - self._last >= self.delta

    def maybe_save(self, state, step: int):
        if self.due():
            self._last = time.time()
            return save(self.directory, state, step)
        return None
