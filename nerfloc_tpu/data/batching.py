"""Host-side batch assembly.

The reference's per-item dict contract (reference: nerf_loc/datasets/video/
dataset.py:478-499) includes host-only metadata (scene name, filename).
`device_batch` keeps the numeric fields; `stack_batches` assembles a leading
query axis for the SPMD train step (the reference runs batch_size=1 per GPU,
pl/train.py:47; here B = mesh 'data' width).
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

_DEVICE_KEYS = (
    "image", "depth", "pose", "K", "near", "far",
    "topk_images", "topk_depths", "topk_poses", "topk_Ks",
    "topk_depths_gt", "points3d", "points3d_mask", "target_mask",
    "bbox3d_corners", "scale_factor",
)


def device_batch(item: Dict) -> Dict[str, np.ndarray]:
    """Numeric subset of a dataset item, as float32/bool numpy arrays."""
    out = {}
    for k in _DEVICE_KEYS:
        if k in item:
            v = np.asarray(item[k])
            if v.dtype == np.float64:
                v = v.astype(np.float32)
            out[k] = v
    return out


def stack_batches(items: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Stack per-query dicts along a new leading axis (all items must share
    static shapes — the data layer's padding guarantees this)."""
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items], axis=0) for k in keys}
