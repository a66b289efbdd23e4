"""Checkpointing: orbax-backed save/restore of training state.

Counterpart of the reference TF Checkpointer/Snapshotter
(flybody/agents/learning_dmpo.py:104-138): periodic checkpoints of the full
learner state (networks, targets, optimizers, dual variables, counters)
plus standalone policy-params snapshots for inference/controller reuse.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Periodic checkpointing of an arbitrary pytree."""

    def __init__(self, directory: str, time_delta_minutes: float = 30.0,
                 max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep))
        self._delta = time_delta_minutes * 60.0
        self._last = 0.0

    @staticmethod
    def _strip_empty(tree):
        """orbax cannot serialize zero-size arrays (e.g. a (0,)-shaped act
        vector); replace them with None and restore from the template."""
        leaves, treedef = jax.tree.flatten(tree)
        stripped = [None if (hasattr(x, 'size') and x.size == 0) else x
                    for x in leaves]
        return {'leaves': stripped}, (leaves, treedef)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        now = time.time()
        if not force and now - self._last < self._delta:
            return False
        payload, _ = self._strip_empty(state)
        self._mngr.save(step, args=ocp.args.StandardSave(payload))
        self._mngr.wait_until_finished()
        self._last = now
        return True

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        step = self._mngr.latest_step() if step is None else step
        if step is None:
            return state_like
        target, (leaves_like, treedef) = self._strip_empty(state_like)
        restored = list(self._mngr.restore(
            step, args=ocp.args.StandardRestore(target))['leaves'])
        # Re-insert the zero-size leaves from the template (None slots may
        # be preserved or dropped depending on the orbax version).
        if len(restored) != len(leaves_like):
            it = iter(restored)
            restored = [None if (hasattr(x, 'size') and x.size == 0)
                        else next(it) for x in leaves_like]
        merged = [like if (r is None) else r
                  for like, r in zip(leaves_like, restored)]
        return jax.tree.unflatten(treedef, merged)

    @property
    def latest_step(self):
        return self._mngr.latest_step()


def save_policy_snapshot(directory: str, name: str, policy_params) -> str:
    """Standalone policy snapshot (the reference Snapshotter's 'policy-N'
    SavedModel export becomes a params-only orbax save)."""
    path = os.path.join(os.path.abspath(directory), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, policy_params, force=True)
    ckptr.wait_until_finished()
    return path


def load_policy_snapshot(path: str, params_like):
    # orbax requires absolute paths (tensorstore kvstore spec).
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=params_like)
