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

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    u1i = jnp.clip(u0i + 1, 0, W - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    v1i = jnp.clip(v0i + 1, 0, H - 1)

    flat = feat.reshape(H * W, C)

    def g(vi, ui):
        return jnp.take(flat, vi * W + ui, axis=0)

    f00 = g(v0i, u0i)
    f01 = g(v0i, u1i)
    f10 = g(v1i, u0i)
    f11 = g(v1i, u1i)

    w00 = ((1 - du) * (1 - dv))[..., None]
    w01 = (du * (1 - dv))[..., None]
    w10 = ((1 - du) * dv)[..., None]
    w11 = (du * dv)[..., None]

    out = f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11
    if padding_mode == "zeros":
        inside = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
        out = out * inside[..., None].astype(out.dtype)
    return out


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
