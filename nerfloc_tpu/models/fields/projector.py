"""Multi-view projection + sampling of support images/features.

Pure-function rebuild of the IBRNet Projector (reference:
nerf_loc/models/ibrnet/ibrnet.py:122-231): project world points into each
support view, bilinearly sample RGB and feature maps, and produce validity
masks and ray-angle features. grid_sample(align_corners=True) becomes
ops.interp.bilinear_sample in pixel units.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geometry.cameras import camera_project, world_to_camera
from ...geometry.math import safe_normalize
from ...ops.interp import bilinear_sample

Array = jax.Array


class Projection(NamedTuple):
    uv: Array        # [V, N, 2] pixel locations in image resolution
    depth: Array     # [V, N] projected z-depth
    in_front: Array  # [V, N] bool, z > ~0 (ibrnet.py:190)
    inbound: Array   # [V, N] bool, inside [0, W-1] x [0, H-1] (ibrnet.py:126-137)


def compute_projections(xyz: Array, Ks: Array, c2ws: Array, H: int, W: int) -> Projection:
    """Project [N, 3] world points into V cameras (ibrnet.py:169-192)."""
    def per_view(K, c2w):
        pts_cam = world_to_camera(c2w, xyz)
        u, v, z = camera_project(pts_cam, K)
        u = jnp.clip(u, -1e6, 1e6)
        v = jnp.clip(v, -1e6, 1e6)
        return jnp.stack([u, v], axis=-1), z

    uv, z = jax.vmap(per_view)(Ks, c2ws)
    in_front = z > 0
    inbound = (uv[..., 0] >= 0) & (uv[..., 0] <= W - 1.0) & \
              (uv[..., 1] >= 0) & (uv[..., 1] <= H - 1.0)
    return Projection(uv, z, in_front, inbound)


def project_and_sample(xyz: Array, Ks: Array, c2ws: Array, images: Array,
                       featmaps: Array):
    """Projector.compute (ibrnet.py:194-231).

    Args:
      xyz: [N, 3]; Ks [V,3,3]; c2ws [V,4,4];
      images: [V, H, W, 3]; featmaps: [V, h, w, C] (any resolution).
    Returns:
      rgb [N, V, 3], feat [N, V, C], mask [N, V, 1] (in_front & inbound).
    """
    V, H, W = images.shape[0], images.shape[1], images.shape[2]
    h, w = featmaps.shape[1], featmaps.shape[2]
    proj = compute_projections(xyz, Ks, c2ws, H, W)

    rgb = jax.vmap(lambda img, uv: bilinear_sample(img, uv))(images, proj.uv)
    # featmaps may be a different resolution: the reference normalizes uv by
    # the IMAGE size and lets grid_sample(align_corners=True) rescale
    # (ibrnet.py:214-222) -> uv_feat = uv * (size_f - 1) / (size_img - 1).
    scale = jnp.array([(w - 1.0) / (W - 1.0), (h - 1.0) / (H - 1.0)], dtype=xyz.dtype)
    feat = jax.vmap(lambda fm, uv: bilinear_sample(fm, uv))(featmaps, proj.uv * scale)

    mask = (proj.in_front & proj.inbound).astype(xyz.dtype)
    return (rgb.transpose(1, 0, 2), feat.transpose(1, 0, 2), mask.T[..., None])


def compute_angle(xyz: Array, query_pose: Array, support_poses: Array) -> Array:
    """Ray-angle features (ibrnet.py:144-167).

    Returns [V, N, 4]: unit difference of the (point->query-cam) and
    (point->support-cam) directions plus their dot product.
    """
    ray2tar = safe_normalize(query_pose[:3, 3][None, :] - xyz)  # [N, 3]

    def per_view(pose):
        ray2src = safe_normalize(pose[:3, 3][None, :] - xyz)
        diff = safe_normalize(ray2tar - ray2src)
        dot = jnp.sum(ray2tar * ray2src, axis=-1, keepdims=True)
        return jnp.concatenate([diff, dot], axis=-1)

    return jax.vmap(per_view)(support_poses)
