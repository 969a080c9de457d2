"""Shared evaluation loop (used by both CLIs).

Equivalent of the reference test loop + gather + per-scene reduction
(reference: pl/model.py:92-276). The final partial batch is padded by
repeating the last item and the padded outputs dropped — the reference never
needs this because DDP ranks each take whole batches.

Item loading/assembly overlaps the device step via a threaded producer
(the reference's 10-worker DataLoader, pl/train.py:47-53; cv2/numpy release
the GIL so threads suffice).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict

import jax
import numpy as np

from ..data import device_batch, stack_batches
from ..parallel.mesh import shard_batch
from ..utils.metrics import aggregate_per_scene


def _prefetch_eval_batches(test_ds, batch_size: int, num_workers: int = 8,
                           depth: int = 2):
    """Yield (items, real_count, host_batch) with the final batch padded by
    repeating its last item."""
    n = len(test_ds)
    starts = list(range(0, n, batch_size))
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def produce():
        try:
            with ThreadPoolExecutor(num_workers) as pool:
                for start in starts:
                    if stop.is_set():
                        return
                    idxs = list(range(start, min(start + batch_size, n)))
                    real = len(idxs)
                    idxs = idxs + [idxs[-1]] * (batch_size - real)
                    items = list(pool.map(lambda i: test_ds[int(i)], idxs))
                    host = stack_batches([device_batch(i) for i in items])
                    q.put((items, real, host))
            q.put(None)
        except BaseException as e:  # surface loader errors in the consumer
            q.put(e)

    threading.Thread(target=produce, daemon=True).start()
    try:
        while True:
            got = q.get()
            if got is None:
                return
            if isinstance(got, BaseException):
                raise got
            yield got
    finally:
        stop.set()


def eval_dataset(test_ds, eval_step, params, mesh, batch_size: int,
                 rng, scene_names: Dict[int, str], cfg,
                 collect_poses: bool = False) -> Dict:
    if jax.process_count() > 1:
        raise NotImplementedError(
            "multi-host eval needs a per-process test-set shard + "
            "process_allgather of the metric arrays (parallel/mesh.py)")
    name_to_id = {v: k for k, v in scene_names.items()}
    rot, trans, sids, scales, files, ious = [], [], [], [], [], []
    poses_pred, poses_gt = [], []
    for items, real, host_batch in _prefetch_eval_batches(test_ds, batch_size):
        batch = shard_batch(host_batch, mesh)
        rng, erng = jax.random.split(rng)
        out = eval_step(params, batch, erng)
        rot.append(np.asarray(out["rot_err_deg"])[:real])
        trans.append(np.asarray(out["trans_err_m"])[:real])
        if "matching_iou" in out:
            ious.append(np.asarray(out["matching_iou"])[:real])
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
        dataset_type=cfg.dataset_type,
        extras={"matching_iou": np.concatenate(ious)} if ious else None)
    results["avg"]["files"] = len(files)
    if collect_poses:
        results["_poses"] = {
            "filenames": files,
            "poses_pred": np.concatenate(poses_pred, axis=0),
            "poses_gt": np.stack(poses_gt),
        }
    return results
