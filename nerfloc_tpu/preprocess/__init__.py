"""Offline preprocessing CLIs.

Equivalents of the reference preprocessors (reference:
nerf_loc/datasets/video/preprocess_{7scenes,12scenes,cambridge,onepose}.py):
each emits the scene-store contract — per-frame `info_{train,test}.pkl`
(file_name, depth_file_name, extrinsic_Tcw, camera_intrinsic, near/far
percentiles, sequence/frame ids) plus `pc.ply` — consumed by
data/scene_store.py. TSDF fusion runs on the native C++ engine
(native/tsdf.cpp) instead of pycuda/numba.
"""
from .common import frame_near_far, load_pose_txt, write_info

__all__ = ["frame_near_far", "load_pose_txt", "write_info"]
