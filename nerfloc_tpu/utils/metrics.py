"""Evaluation metrics.

Rebuild of the reference metric surface (reference: nerf_loc/utils/metrics.py:
14-41 and pl/model.py:192-261): pose errors, pose accuracy under per-dataset
thresholds, matching IoU, and the per-scene median aggregation used for the
headline numbers. All functions are jit-safe; aggregation helpers accept
stacked per-query arrays (the all-gathered eval outputs).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# reference pl/model.py:230-236 — per-scene Cambridge translation thresholds (m)
CAMBRIDGE_TRANS_THRESH = {
    "StMarysChurch": 0.35,
    "GreatCourt": 0.45,
    "OldHospital": 0.22,
    "KingsCollege": 0.38,
    "ShopFacade": 0.15,
}


def compute_pose_error(T_est: Array, T_gt: Array) -> Tuple[Array, Array]:
    """(rotation error deg, translation L2). Reference utils/metrics.py:14-33."""
    R1 = T_est[..., :3, :3]
    R2 = T_gt[..., :3, :3]
    # trace(R2 R1^T) = sum(R2 * R1) elementwise — a 3x3 jnp.matmul would run
    # bf16 on the TPU MXU and add ~0.5 deg of metric noise
    trace = jnp.sum(R2 * R1, axis=(-2, -1))
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    rot_err = jnp.degrees(jnp.arccos(cos))
    trans_err = jnp.linalg.norm(T_est[..., :3, 3] - T_gt[..., :3, 3], axis=-1)
    return rot_err, trans_err


def pose_accuracy(rot_err_deg: Array, trans_err_m: Array,
                  rot_thresh: float = 5.0, trans_thresh: float = 0.05) -> Array:
    """Fraction of poses with rot < thresh AND trans < thresh
    (reference configs/__init__.py:81-82, pl/model.py:239-245)."""
    ok = (rot_err_deg < rot_thresh) & (trans_err_m < trans_thresh)
    return jnp.mean(ok.astype(jnp.float32))


def matching_iou(match_j: Array, match_mask: Array, j_gt: Array,
                 gt_mask: Array) -> Array:
    """IoU between the predicted and GT 3D->2D match sets
    (reference utils/metrics.py:36-41), in static-shape masked form.

    A 3D keypoint i contributes to the intersection when both sets contain it
    and agree on the matched 2D cell.
    """
    inter = (match_mask & gt_mask & (match_j == j_gt)).astype(jnp.float32)
    union = (match_mask | gt_mask).astype(jnp.float32)
    return jnp.sum(inter) / jnp.maximum(jnp.sum(union), 1.0)


def aggregate_per_scene(scene_ids: np.ndarray, rot_err: np.ndarray,
                        trans_err: np.ndarray, scene_names: Dict[int, str],
                        scale_factors: Optional[np.ndarray] = None,
                        rot_thresh: float = 5.0,
                        trans_thresh: float = 0.05,
                        dataset_type: str = "",
                        extras: Optional[Dict[str, np.ndarray]] = None
                        ) -> Dict[str, Dict[str, float]]:
    """Host-side per-scene medians + accuracy (reference pl/model.py:192-261).

    trans errors are divided by per-query scale_factor to undo scene rescaling
    (reference pl/model.py:219), and Cambridge scenes use their per-scene
    translation thresholds (reference :230-236).

    extras: optional per-query metric arrays (same length as scene_ids, e.g.
    matching IoU, reference pl/model.py:111-112) reduced by per-scene mean.
    """
    if scale_factors is not None:
        trans_err = trans_err / np.maximum(scale_factors, 1e-12)
    out: Dict[str, Dict[str, float]] = {}
    accs, med_r, med_t = [], [], []
    for sid in np.unique(scene_ids):
        name = scene_names.get(int(sid), str(int(sid)))
        sel = scene_ids == sid
        r, t = rot_err[sel], trans_err[sel]
        tt = trans_thresh
        if "cambridge" in dataset_type.lower():
            tt = CAMBRIDGE_TRANS_THRESH.get(name, trans_thresh)
        acc = float(np.mean((r < rot_thresh) & (t < tt)))
        out[name] = {
            "median_rot_err_deg": float(np.median(r)),
            "median_trans_err_m": float(np.median(t)),
            "pose_acc": acc,
            "n": int(sel.sum()),
        }
        if extras:
            for k, v in extras.items():
                out[name][k] = float(np.mean(v[sel]))
        accs.append(acc)
        med_r.append(float(np.median(r)))
        med_t.append(float(np.median(t)))
    out["avg"] = {
        "median_rot_err_deg": float(np.mean(med_r)) if med_r else float("nan"),
        "median_trans_err_m": float(np.mean(med_t)) if med_t else float("nan"),
        "pose_acc": float(np.mean(accs)) if accs else float("nan"),
        "n": int(len(scene_ids)),
    }
    if extras:
        for k, v in extras.items():
            out["avg"][k] = float(np.mean(v))
    return out
