"""Orbax checkpointing with shape-matched partial restore.

Replaces the reference's Lightning ModelCheckpoint + auto-resume + partial
state-dict load (reference: pl/train.py:55-98 — a `last` checkpoint for
resume plus metric-keyed ModelCheckpoint callbacks on psnr_test / pose_acc /
median_trans_err with top-k retention; pl/model.py:33-41 shape-matched
partial restore enabling pretrain -> per-scene finetune with head changes,
e.g. adding the scene-coordinate MLPs, conditional_nerf/model.py:115-130).

Layout under `directory`:
  <step>/...                    recency stream (max_to_keep, auto-resume)
  best_<metric>/<step>/...      one best-k stream per entry in `metric_keys`
                                (orbax best_fn retention: a later WORSE save
                                never evicts the best checkpoint)
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


# the reference's three ModelCheckpoint monitors (pl/train.py:55-85)
DEFAULT_METRIC_MODES = {"pose_acc": "max", "median_trans_err_m": "min",
                        "psnr_test": "max"}


class CheckpointManager:
    """Step-keyed checkpoints: a recency stream for auto-resume plus optional
    metric-keyed best-k streams (reference pl/train.py:55-85)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 metric_keys: Optional[Dict[str, str]] = None,
                 keep_best: int = 1):
        """metric_keys: {metric_name: 'max'|'min'} — each gets its own
        best-k stream under best_<metric>/, fed by save() calls whose
        `metrics` dict contains that metric."""
        self.directory = os.path.abspath(directory)
        self.metric_keys = dict(metric_keys or {})
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best: Dict[str, ocp.CheckpointManager] = {}
        for key, mode in self.metric_keys.items():
            assert mode in ("max", "min"), f"bad mode for {key}: {mode}"
            self._best[key] = ocp.CheckpointManager(
                os.path.join(self.directory, f"best_{key}"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=keep_best, create=True,
                    best_fn=(lambda m, k=key: float(m[k])), best_mode=mode,
                    keep_checkpoints_without_metrics=False),
            )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        saveable = to_saveable(state)
        self._mgr.save(step, args=ocp.args.StandardSave(saveable),
                       metrics=metrics)
        if metrics:
            for key, mgr in self._best.items():
                if key in metrics and np.isfinite(float(metrics[key])):
                    mgr.save(step, args=ocp.args.StandardSave(saveable),
                             metrics={k: float(v) for k, v in metrics.items()
                                      if _is_scalar(v)})
        self.wait_until_finished()

    def wait_until_finished(self):
        self._mgr.wait_until_finished()
        for mgr in self._best.values():
            mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self, metric: Optional[str] = None) -> Optional[int]:
        """Step of the retained best checkpoint for `metric` (or the first
        configured metric). None if no best stream / nothing saved yet."""
        mgr = self._best_mgr(metric)
        return mgr.best_step() if mgr is not None else None

    def _best_mgr(self, metric: Optional[str]):
        if metric is not None:
            return self._best.get(metric)
        return next(iter(self._best.values())) if self._best else None

    def restore(self, step: Optional[int] = None, template: Any = None,
                best: Optional[str] = None) -> Any:
        """Restore from the recency stream, or — with `best=<metric>` (or
        `best=''` for the first configured metric) — from that metric's
        best-k stream."""
        mgr = self._mgr
        if best is not None:
            bm = self._best_mgr(best or None)
            if bm is not None and bm.best_step() is not None:
                mgr = bm
                step = bm.best_step() if step is None else step
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            try:
                return mgr.restore(
                    step, args=ocp.args.StandardRestore(to_saveable(template)))
            except ValueError:
                # Template tree differs from the stored tree — e.g. testing
                # with cascade_matching off against a checkpoint trained with
                # it on (ablations), or warm-starting a model with extra
                # heads (reference pl/model.py:33-41 shape-matched merge).
                # Fall back to a raw restore; callers merge the intersection
                # with partial_restore().
                pass
        return mgr.restore(step)


def discover_best_dirs(directory: str) -> Dict[str, str]:
    """Map metric name -> best-stream dir for streams present on disk (lets
    cli.test prefer a best checkpoint without knowing the train config)."""
    out = {}
    if os.path.isdir(directory):
        for name in sorted(os.listdir(directory)):
            if name.startswith("best_") and os.path.isdir(
                    os.path.join(directory, name)):
                out[name[len("best_"):]] = os.path.join(directory, name)
    return out


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


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
