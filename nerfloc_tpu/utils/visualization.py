"""Visualization helpers (host-side).

Rebuild of the reference vis utils (reference: nerf_loc/utils/
visualization.py:15-84 — 3D box overlay + video export; pl/model.py:263-276
trajectory dumps).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

# 12 edges of a box given its 8 corners in OnePose order
BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
             (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]


def project_points_np(xyz: np.ndarray, K: np.ndarray,
                      w2c: np.ndarray) -> np.ndarray:
    cam = xyz @ w2c[:3, :3].T + w2c[:3, 3]
    z = np.maximum(cam[:, 2], 1e-8)
    return (cam[:, :2] @ K[:2, :2].T) / z[:, None] + K[:2, 2]


def draw_box3d(img: np.ndarray, corners: np.ndarray, K: np.ndarray,
               pose_c2w: np.ndarray, color=(0, 255, 0),
               thickness: int = 2) -> np.ndarray:
    """Overlay a 3D box wireframe (reference visualization.py:15-50).

    img: uint8 [H, W, 3]; corners: [8, 3] world; pose: camera-to-world.
    """
    import cv2

    w2c = np.linalg.inv(pose_c2w)
    uv = project_points_np(corners, K, w2c).astype(np.int32)
    out = img.copy()
    for a, b in BOX_EDGES:
        cv2.line(out, tuple(uv[a]), tuple(uv[b]), color, thickness)
    return out


def export_video(frames: Sequence[np.ndarray], path: str, fps: int = 10):
    """PNG frames -> mp4 (reference visualization.py:52-84)."""
    import cv2

    if not frames:
        return
    H, W = frames[0].shape[:2]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def dump_trajectory(path: str, filenames: List[str],
                    poses_pred: np.ndarray, poses_gt: np.ndarray,
                    points3d: Optional[np.ndarray] = None):
    """Trajectory + scene points pkl (reference pl/model.py:263-276)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({
            "filenames": filenames,
            "poses_pred": np.asarray(poses_pred),
            "poses_gt": np.asarray(poses_gt),
            "points3d": points3d,
        }, f)
