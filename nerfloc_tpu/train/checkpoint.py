"""Orbax checkpointing with shape-matched partial restore.

Replaces the reference's Lightning ModelCheckpoint + auto-resume + partial
state-dict load (reference: pl/train.py:55-98 metric-keyed checkpoints and
latest-ckpt glob; pl/model.py:33-41 shape-matched partial restore enabling
pretrain -> per-scene finetune with head changes, e.g. adding the
scene-coordinate MLPs, conditional_nerf/model.py:115-130).
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-keyed checkpoints with top-k retention on a metric."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(to_saveable(state)),
                       metrics=metrics)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(to_saveable(template)))
        return self._mgr.restore(step)


def to_saveable(state: Any):
    """Strip non-pytree fields (e.g. the optax transform closure)."""
    if hasattr(state, "params") and hasattr(state, "opt_state"):
        return {"step": state.step, "params": state.params,
                "opt_state": state.opt_state}
    return state


def partial_restore(params: Any, restored: Any) -> Any:
    """Copy leaves from `restored` into `params` wherever the path exists AND
    the shape matches; keep the fresh initialization elsewhere.

    Equivalent of the reference's shape-matched state-dict merge
    (pl/model.py:33-41).
    """
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    out = {}
    n_loaded = 0
    for path, leaf in flat_p.items():
        r = flat_r.get(path)
        if r is not None and np.shape(r) == np.shape(leaf):
            out[path] = jax.numpy.asarray(r, dtype=leaf.dtype)
            n_loaded += 1
        else:
            out[path] = leaf
    treedef = jax.tree_util.tree_structure(params)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    result = jax.tree_util.tree_unflatten(treedef, leaves)
    return result
