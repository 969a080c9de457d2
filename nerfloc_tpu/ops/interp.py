"""Bilinear feature-map sampling (the torch `grid_sample` replacement).

The reference samples V-view feature maps at projected point locations via
F.grid_sample with align_corners=True (reference: nerf_loc/models/ibrnet/
ibrnet.py:217-222) or align_corners variants in interpolate_feats
(conditional_nerf/neuray_ops.py:14-36). On TPU this becomes four gathers +
a weighted sum; XLA fuses the weighting into the gather consumers.

Feature maps are NHWC (TPU-friendly layout; channels innermost so gathers
move contiguous lanes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bilinear_sample(feat: Array, uv: Array, *, padding_mode: str = "border") -> Array:
    """Sample [H, W, C] features at [..., 2] pixel coords (u, v), u along W.

    Pixel coordinates are in *pixel units* referencing pixel centers, i.e.
    uv=(0,0) reads feat[0,0] exactly — identical to grid_sample with
    align_corners=True after the reference's `2*uv/(size-1)-1` normalization
    (ibrnet.py:139-142).

    padding_mode: 'border' clamps; 'zeros' returns 0 outside [0, W-1]x[0, H-1].
    """
    H, W, C = feat.shape
    u, v = uv[..., 0], uv[..., 1]

    if padding_mode == "border":
        # torch clamps the *coordinate* to the border before interpolating
        # (grid_sampler clip_coordinates), not just the gather indices.
        u = jnp.clip(u, 0.0, W - 1)
        v = jnp.clip(v, 0.0, H - 1)

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    u0f = u0.astype(jnp.int32)
    v0f = v0.astype(jnp.int32)
    u0i = jnp.clip(u0f, 0, W - 1)
    u1i = jnp.clip(u0f + 1, 0, W - 1)
    v0i = jnp.clip(v0f, 0, H - 1)
    v1i = jnp.clip(v0f + 1, 0, H - 1)

    flat = feat.reshape(H * W, C)

    def g(vi, ui):
        return jnp.take(flat, vi * W + ui, axis=0)

    f00 = g(v0i, u0i)
    f01 = g(v0i, u1i)
    f10 = g(v1i, u0i)
    f11 = g(v1i, u1i)

    w00 = (1 - du) * (1 - dv)
    w01 = du * (1 - dv)
    w10 = (1 - du) * dv
    w11 = du * dv

    if padding_mode == "zeros":
        # torch zeros each out-of-bounds *corner* individually, so samples
        # straddling the border still blend the inside corners.
        def inb(vi, ui):
            return ((ui >= 0) & (ui <= W - 1) & (vi >= 0) & (vi <= H - 1)
                    ).astype(feat.dtype)

        w00 = w00 * inb(v0f, u0f)
        w01 = w01 * inb(v0f, u0f + 1)
        w10 = w10 * inb(v0f + 1, u0f)
        w11 = w11 * inb(v0f + 1, u0f + 1)

    return (f00 * w00[..., None] + f01 * w01[..., None]
            + f10 * w10[..., None] + f11 * w11[..., None])


def bilinear_sample_views(feats: Array, uv: Array, *, padding_mode: str = "border") -> Array:
    """vmap of bilinear_sample over a leading view axis.

    Args:
      feats: [V, H, W, C]; uv: [V, ..., 2].
    Returns: [V, ..., C].
    """
    return jax.vmap(lambda f, p: bilinear_sample(f, p, padding_mode=padding_mode))(feats, uv)


def resize_bilinear(img: Array, H: int, W: int) -> Array:
    """[h, w, C] -> [H, W, C] bilinear resize (jax.image; replaces
    F.interpolate in e.g. reference model.py:226-227)."""
    return jax.image.resize(img, (H, W, img.shape[-1]), method="bilinear")


def resize_nearest(img: Array, H: int, W: int) -> Array:
    """Nearest resize, used for depth maps (reference uses F.interpolate
    default 'nearest' on depth, model.py:226)."""
    return jax.image.resize(img, (H, W) + img.shape[2:], method="nearest")
