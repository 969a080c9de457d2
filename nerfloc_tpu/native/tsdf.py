"""TSDF fusion: Python surface over the native integrator.

Equivalent of the reference TSDFVolume (reference: nerf_loc/datasets/video/
fusion.py:19-425): integrate posed RGB-D frames into a truncated SDF volume
and extract a colored surface point cloud (the `pc.ply` the dataset layer
consumes). `get_view_frustum`-style bounds estimation is a classmethod.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from .build import load_library


def _lib():
    lib = load_library("tsdf")
    lib.tsdf_create.restype = ctypes.c_void_p
    lib.tsdf_create.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_void_p,
                                ctypes.c_float, ctypes.c_float]
    lib.tsdf_free.argtypes = [ctypes.c_void_p]
    lib.tsdf_integrate.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_float]
    lib.tsdf_count_surface.restype = ctypes.c_int64
    lib.tsdf_count_surface.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.tsdf_extract_points.restype = ctypes.c_int64
    lib.tsdf_extract_points.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                        ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_int64]
    lib.tsdf_extract_mesh.restype = ctypes.c_int64
    lib.tsdf_extract_mesh.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64]
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class TSDFVolume:
    """Truncated SDF volume over an axis-aligned bounding box."""

    def __init__(self, vol_bounds: np.ndarray, voxel_size: float,
                 trunc_margin: Optional[float] = None):
        """vol_bounds: [3, 2] min/max in metres (reference fusion.py ctor)."""
        vol_bounds = np.asarray(vol_bounds, dtype=np.float32)
        self.voxel_size = float(voxel_size)
        self.sdf_trunc = float(trunc_margin if trunc_margin is not None
                               else 5.0 * voxel_size)
        dims = np.ceil((vol_bounds[:, 1] - vol_bounds[:, 0])
                       / voxel_size).astype(np.int64)
        self.dims = np.maximum(dims, 1)
        self.origin = np.ascontiguousarray(vol_bounds[:, 0], dtype=np.float32)
        self._lib = _lib()
        self._vol = self._lib.tsdf_create(
            int(self.dims[0]), int(self.dims[1]), int(self.dims[2]),
            _ptr(self.origin), self.voxel_size, self.sdf_trunc)

    def integrate(self, color: Optional[np.ndarray], depth: np.ndarray,
                  K: np.ndarray, c2w: np.ndarray, obs_weight: float = 1.0):
        """color [H,W,3] in [0,1] or None; depth [H,W] metres; c2w [4,4]."""
        depth = np.ascontiguousarray(depth, dtype=np.float32)
        H, W = depth.shape
        Kc = np.ascontiguousarray(K, dtype=np.float32)
        Tc = np.ascontiguousarray(c2w, dtype=np.float32)
        if color is not None:
            color = np.ascontiguousarray(color, dtype=np.float32)
            cptr = _ptr(color)
        else:
            cptr = None
        self._lib.tsdf_integrate(self._vol, _ptr(depth), cptr, H, W,
                                 _ptr(Kc), _ptr(Tc), float(obs_weight))

    def get_point_cloud(self, thresh: float = 0.2
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Surface voxel centers + colors (reference get_point_cloud)."""
        n = self._lib.tsdf_count_surface(self._vol, float(thresh))
        xyz = np.empty((max(n, 1), 3), dtype=np.float32)
        rgb = np.empty((max(n, 1), 3), dtype=np.float32)
        m = self._lib.tsdf_extract_points(self._vol, float(thresh),
                                          _ptr(xyz), _ptr(rgb), int(n))
        return xyz[:m], rgb[:m]

    def get_mesh(self, max_triangles: int = 4_000_000) -> np.ndarray:
        """Surface triangles [T, 3, 3] by marching tetrahedra (reference
        get_mesh, fusion.py; the reference used skimage marching_cubes)."""
        buf = np.empty((max_triangles, 9), dtype=np.float32)
        n = self._lib.tsdf_extract_mesh(self._vol, _ptr(buf),
                                        int(max_triangles))
        tris = buf[:n].reshape(-1, 3, 3)
        # drop degenerate slivers (crossings collapsed onto a lattice point)
        a = tris[:, 1] - tris[:, 0]
        b = tris[:, 2] - tris[:, 0]
        area2 = np.linalg.norm(np.cross(a, b), axis=1)
        return tris[area2 > 1e-12]

    def __del__(self):
        try:
            self._lib.tsdf_free(self._vol)
        except Exception:
            pass

    @staticmethod
    def frustum_bounds(depths, Ks, c2ws, margin: float = 0.1) -> np.ndarray:
        """[3, 2] AABB of all view frusta (reference get_view_frustum over
        frames, preprocess_7scenes.py:38-90)."""
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for depth, K, c2w in zip(depths, Ks, c2ws):
            d = depth[depth > 0]
            if d.size == 0:
                continue
            dmax = float(d.max())
            H, W = depth.shape
            corners = np.array([[0, 0], [W, 0], [0, H], [W, H]], np.float64)
            for dd in (0.0, dmax):
                x = (corners[:, 0] - K[0, 2]) / K[0, 0] * dd
                y = (corners[:, 1] - K[1, 2]) / K[1, 1] * dd
                pts = np.stack([x, y, np.full(4, dd)], -1)
                w = pts @ np.asarray(c2w)[:3, :3].T + np.asarray(c2w)[:3, 3]
                lo = np.minimum(lo, w.min(0))
                hi = np.maximum(hi, w.max(0))
        return np.stack([lo - margin, hi + margin], axis=-1)
