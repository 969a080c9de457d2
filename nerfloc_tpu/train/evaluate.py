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
from ..models.fields.losses import img2mse, mse2psnr
from ..parallel.mesh import shard_batch
from ..parallel.multihost import allgather_metrics, process_shard_indices
from ..utils.metrics import aggregate_per_scene


def _prefetch_eval_batches(test_ds, batch_size: int, num_workers: int = 8,
                           depth: int = 2, indices=None):
    """Yield (items, real_count, host_batch) with the final batch padded by
    repeating its last item. `indices` restricts iteration to a subset of
    the test set (multi-process shard)."""
    pool_idx = list(range(len(test_ds))) if indices is None else list(indices)
    n = len(pool_idx)
    starts = list(range(0, n, batch_size))
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put(item) -> bool:
        # Never block forever on a full queue: if the consumer exited early
        # (eval_step exception) nobody drains it, so re-check `stop` while
        # waiting instead of leaking a thread pinning device-sized batches.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            with ThreadPoolExecutor(num_workers) as pool:
                for start in starts:
                    if stop.is_set():
                        return
                    idxs = pool_idx[start:start + batch_size]
                    real = len(idxs)
                    idxs = idxs + [idxs[-1]] * (batch_size - real)
                    items = list(pool.map(lambda i: test_ds[int(i)], idxs))
                    host = stack_batches([device_batch(i) for i in items])
                    if not put((items, real, host)):
                        return
            put(None)
        except BaseException as e:  # surface loader errors in the consumer
            put(e)

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


_FNAME_BYTES = 256


def _encode_names(names) -> np.ndarray:
    """Strings -> fixed-width [N, 256] uint8 rows so filenames ride the same
    numeric process_allgather as the metric arrays (reference gathers them
    via all_gather_object, pl/model.py:263-276)."""
    arr = np.zeros((len(names), _FNAME_BYTES), np.uint8)
    for i, s in enumerate(names):
        b = s.encode("utf-8")[:_FNAME_BYTES]
        arr[i, :len(b)] = np.frombuffer(b, np.uint8)
    return arr


def _decode_names(arr) -> list:
    return [bytes(row[row != 0]).decode("utf-8") for row in np.asarray(arr)]


def make_render_psnr_fn(model):
    """One jitted full-image render (built ONCE so the XLA cache persists
    across epoch evals). Used by cli.train's epoch eval to log psnr_test —
    the reference's val loop renders and logs rgb/depth + psnr_test every
    epoch and keys a ModelCheckpoint on it (pl/model.py:123-164,
    pl/train.py:55-85)."""
    import jax.numpy as jnp

    @jax.jit
    def render_one(params, batch):
        def f(m):
            ctx, _ = m.build_context(batch)
            H, W = batch["image"].shape[0], batch["image"].shape[1]
            return m.model_3d.render_image(ctx, batch["K"], batch["pose"],
                                           H, W)
        return model.apply(params, method=f)

    def psnr_of(params, item):
        batch = {k: jnp.asarray(v) for k, v in device_batch(item).items()}
        out = render_one(params, batch)
        return float(mse2psnr(img2mse(out["rgb"], batch["image"],
                                      mask=out["mask"])))

    return psnr_of


def render_psnr_eval(psnr_of, params, test_ds, max_views: int = 2,
                     interval: int = 0) -> Dict:
    """Mean render PSNR over up to `max_views` strided test views."""
    n = len(test_ds)
    if n == 0 or max_views <= 0:
        # omit psnr_test entirely: a NaN here would flow into the train-log
        # JSON line (json.dumps emits a bare NaN token — invalid strict
        # JSON) and into the orbax recency-stream metrics
        return {"n_rendered": 0}
    stride = max(interval, 1) if interval else max(n // max_views, 1)
    idxs = list(range(0, n, stride))[:max_views]
    psnrs = [psnr_of(params, test_ds[i]) for i in idxs]
    return {"psnr_test": float(np.mean(psnrs)), "n_rendered": len(psnrs)}


def eval_dataset(test_ds, eval_step, params, mesh, batch_size: int,
                 rng, scene_names: Dict[int, str], cfg,
                 collect_poses: bool = False) -> Dict:
    multiproc = jax.process_count() > 1
    if multiproc and len(test_ds) < jax.process_count():
        # An empty strided shard would reach np.concatenate([]) before the
        # collective and hang the other processes mid-allgather.
        raise ValueError(
            f"multi-process eval needs len(test_ds) >= process_count "
            f"({len(test_ds)} < {jax.process_count()})")
    indices = process_shard_indices(len(test_ds)) if multiproc else None
    name_to_id = {v: k for k, v in scene_names.items()}
    rot, trans, sids, scales, files, ious = [], [], [], [], [], []
    poses_pred, poses_gt = [], []
    for items, real, host_batch in _prefetch_eval_batches(
            test_ds, batch_size, indices=indices):
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
    rot = np.concatenate(rot)
    trans = np.concatenate(trans)
    sids = np.asarray(sids)
    scales = np.asarray(scales)
    iou = np.concatenate(ious) if ious else None
    n_files = len(files)
    if multiproc:
        # reference pl/model.py:194-197 all_gather_object equivalent
        local = {"rot": rot, "trans": trans,
                 "sid": sids.astype(np.int64), "scale": scales}
        if iou is not None:
            local["iou"] = iou
        if collect_poses:
            local["pose_pred"] = np.concatenate(poses_pred, axis=0)
            local["pose_gt"] = np.stack(poses_gt)
            local["fname"] = _encode_names(files)
        g = allgather_metrics(local, indices, len(test_ds))
        rot, trans, sids, scales = g["rot"], g["trans"], g["sid"], g["scale"]
        iou = g.get("iou")
        n_files = len(test_ds)
        if collect_poses:
            # returned in global test-set order, identical on every process
            # (reference rank-0 dump, pl/model.py:263-276)
            files = _decode_names(g["fname"])
            poses_pred = [g["pose_pred"]]
            poses_gt = list(g["pose_gt"])
    results = aggregate_per_scene(
        sids, rot, trans,
        scene_names, scales,
        rot_thresh=cfg.rotation_eval_thresh,
        trans_thresh=cfg.translation_eval_thresh,
        dataset_type=cfg.dataset_type,
        extras={"matching_iou": iou} if iou is not None else None)
    results["avg"]["files"] = n_files
    if collect_poses:
        results["_poses"] = {
            "filenames": files,
            "poses_pred": np.concatenate(poses_pred, axis=0),
            "poses_gt": np.stack(poses_gt),
        }
    return results
