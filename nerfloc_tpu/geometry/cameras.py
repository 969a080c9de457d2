"""Pure-JAX pinhole camera math.

Replaces the reference's scattered torch camera helpers:
  - camera_project            (reference: nerf_loc/models/utils.py:12)
  - get_rays                  (reference: nerf_loc/models/conditional_nerf/utils.py:56-70)
  - back_projection           (reference: nerf_loc/datasets/video/geometry.py:218)
  - Projector.compute_projections (reference: nerf_loc/models/ibrnet/ibrnet.py:169-192)

Conventions (same as the reference):
  - `c2w` / `pose`: camera-to-world 4x4, OpenCV camera (x right, y down, z forward).
  - `K`: 3x3 intrinsics.
  - pixel (u, v) with u along width. Ray through pixel center uses unnormalized
    dirs ((u-cx)/fx, (v-cy)/fy, 1) rotated to world; get_rays normalizes.

All functions are shape-polymorphic over leading batch dims where noted and
are safe under jit/vmap (no data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> Array:
    """[H, W, 2] grid of (u, v) pixel coordinates."""
    u = jnp.arange(W, dtype=dtype)
    v = jnp.arange(H, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)


def transform_points(T: Array, pts: Array) -> Array:
    """Apply a 4x4 (or 3x4) rigid transform to [..., 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ R.swapaxes(-1, -2) + t


def world_to_camera(c2w: Array, pts_w: Array) -> Array:
    """World points -> camera frame given camera-to-world pose.

    Uses the closed-form inverse of a rigid transform (R^T, -R^T t) instead of
    a general matrix inverse (reference calls pose.inverse(), e.g.
    nerf_pose_estimator.py:141).
    """
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    return (pts_w - t) @ R  # (pts - t) @ R == R^T (pts - t) row-vector form


def invert_pose(c2w: Array) -> Array:
    """Closed-form inverse of a rigid 4x4 pose."""
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3:]
    Rt = R.swapaxes(-1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=c2w.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def camera_project(pts_cam: Array, K: Array, eps: float = 1e-8) -> tuple[Array, Array, Array]:
    """Project camera-frame points with intrinsics K.

    Returns (u, v, z). Matches reference models/utils.py:12 but guards the
    division for XLA (no NaNs on z<=0; callers mask with z>0).
    """
    uvz = pts_cam @ K.swapaxes(-1, -2)
    z = uvz[..., 2]
    denom = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    u = uvz[..., 0] / denom
    v = uvz[..., 1] / denom
    return u, v, z


def project_points(pts_w: Array, K: Array, c2w: Array, H: int, W: int):
    """Project world points into a camera; returns pixel locations, depth, masks.

    TPU-native replacement for Projector.compute_projections
    (reference ibrnet.py:169-192): same in-front (z>0) and inbound
    ([0, W-1] x [0, H-1]) masks.

    Args:
      pts_w: [..., 3] world points.
      K: [3,3]; c2w: [4,4].
    Returns:
      uv: [..., 2] pixel locations (clamped to +-1e6), z: [...], valid: [...] bool.
    """
    pts_cam = world_to_camera(c2w, pts_w)
    u, v, z = camera_project(pts_cam, K)
    u = jnp.clip(u, -1e6, 1e6)
    v = jnp.clip(v, -1e6, 1e6)
    in_front = z > 0
    inbound = (u >= 0) & (u <= W - 1.0) & (v >= 0) & (v <= H - 1.0)
    return jnp.stack([u, v], axis=-1), z, in_front & inbound


def get_rays(H: int, W: int, K: Array, c2w: Array) -> tuple[Array, Array]:
    """Per-pixel world rays. Matches reference conditional_nerf/utils.py:56-70
    (directions normalized, origins broadcast from camera center).

    Returns (rays_o [H,W,3], rays_d [H,W,3]).
    """
    uv = pixel_grid(H, W, dtype=K.dtype)
    dirs = jnp.stack(
        [
            (uv[..., 0] - K[0, 2]) / K[0, 0],
            (uv[..., 1] - K[1, 2]) / K[1, 1],
            jnp.ones((H, W), dtype=K.dtype),
        ],
        axis=-1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rays_for_pixels(uv: Array, K: Array, c2w: Array) -> tuple[Array, Array]:
    """Rays through arbitrary pixel coordinates [N,2] (float u,v).

    Gather-free equivalent of the reference's points_2d_to_rays
    (conditional_nerf/model.py:687-700), which materializes the full [H,W]
    ray grid and indexes it; here we compute only the requested rays.
    """
    dirs = jnp.stack(
        [
            (uv[..., 0] - K[0, 2]) / K[0, 0],
            (uv[..., 1] - K[1, 2]) / K[1, 1],
            jnp.ones(uv.shape[:-1], dtype=K.dtype),
        ],
        axis=-1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def backproject_depth(depth: Array, K: Array, c2w: Array) -> tuple[Array, Array]:
    """Backproject a [H, W] depth map to world points.

    Equivalent of the reference's per-view loop body in
    backproject_support_frame (conditional_nerf/model.py:230-238), but dense:
    every pixel yields a point, with validity = depth > 0 (static shape).

    Returns (pts_w [H,W,3], valid [H,W] bool).
    """
    H, W = depth.shape
    uv = pixel_grid(H, W, dtype=depth.dtype)
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    pts_cam = jnp.stack([x * depth, y * depth, depth], axis=-1)
    pts_w = transform_points(c2w, pts_cam)
    return pts_w, depth > 0


def scale_intrinsics(K: Array, stride: float) -> Array:
    """Divide the first two rows of K by `stride` (feature-map scale change),
    as the reference does in backproject_support_frame (model.py:225)."""
    scale = jnp.array([1.0 / stride, 1.0 / stride, 1.0], dtype=K.dtype)
    return K * scale[:, None]
