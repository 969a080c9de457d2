"""Shared evaluation loop (used by both CLIs).

Equivalent of the reference test loop + gather + per-scene reduction
(reference: pl/model.py:92-276). The final partial batch is padded by
repeating the last item and the padded outputs dropped — the reference never
needs this because DDP ranks each take whole batches.
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from ..data import device_batch, stack_batches
from ..parallel.mesh import shard_batch
from ..utils.metrics import aggregate_per_scene


def eval_dataset(test_ds, eval_step, params, mesh, batch_size: int,
                 rng, scene_names: Dict[int, str], cfg,
                 collect_poses: bool = False) -> Dict:
    name_to_id = {v: k for k, v in scene_names.items()}
    rot, trans, sids, scales, files = [], [], [], [], []
    poses_pred, poses_gt = [], []
    n = len(test_ds)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        real = len(idxs)
        idxs = idxs + [idxs[-1]] * (batch_size - real)  # pad final batch
        items = [test_ds[i] for i in idxs]
        batch = shard_batch(stack_batches([device_batch(i) for i in items]),
                            mesh)
        rng, erng = jax.random.split(rng)
        out = eval_step(params, batch, erng)
        rot.append(np.asarray(out["rot_err_deg"])[:real])
        trans.append(np.asarray(out["trans_err_m"])[:real])
        sids.extend(name_to_id.get(it["scene"], 0) for it in items[:real])
        scales.extend(float(it["scale_factor"]) for it in items[:real])
        files.extend(it["filename"] for it in items[:real])
        if collect_poses:
            poses_pred.append(np.asarray(out["pose_pred"])[:real])
            poses_gt.extend(np.asarray(it["pose"]) for it in items[:real])
    results = aggregate_per_scene(
        np.asarray(sids), np.concatenate(rot), np.concatenate(trans),
        scene_names, np.asarray(scales),
        rot_thresh=cfg.rotation_eval_thresh,
        trans_thresh=cfg.translation_eval_thresh,
        dataset_type=cfg.dataset_type)
    results["avg"]["files"] = len(files)
    if collect_poses:
        results["_poses"] = {
            "filenames": files,
            "poses_pred": np.concatenate(poses_pred, axis=0),
            "poses_gt": np.stack(poses_gt),
        }
    return results
