"""Retrieval visualization: query + top-k strip images.

Equivalent of the reference's retrieval vis (reference: nerf_loc/models/
image_retrieval/vis.py:16-30).
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


def save_retrieval_strips(base_dir: str, top_k: Dict[str, List[str]],
                          out_dir: str, max_queries: int = 20,
                          thumb: int = 128):
    """For each query: one row [query | db1 | db2 | ...] saved as a PNG."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    for qi, (qname, db_names) in enumerate(top_k.items()):
        if qi >= max_queries:
            break
        tiles = []
        for name in [qname] + list(db_names[:5]):
            img = cv2.imread(os.path.join(base_dir, name))
            if img is None:
                continue
            h, w = img.shape[:2]
            s = thumb / min(h, w)
            img = cv2.resize(img, (int(w * s), int(h * s)))[:thumb, :thumb]
            tiles.append(img)
        if not tiles:
            continue
        strip = np.concatenate(tiles, axis=1)
        # red separator after the query tile
        strip[:, thumb - 2: thumb + 2] = (0, 0, 255)
        safe = qname.replace("/", "_")
        cv2.imwrite(os.path.join(out_dir, f"retrieval_{safe}.png"), strip)
