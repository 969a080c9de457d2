"""Rendering losses (NeRF-W style uncertainty RGB + inverse-depth + feature).

Rebuild of RenderingLoss (reference: nerf_loc/models/conditional_nerf/
losses.py:23-93) in masked static-shape form, plus img2mse/mse2psnr
(conditional_nerf/utils.py:115-128).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .neuray import to_inverse_normalized_depth

Array = jax.Array


def masked_mean(x: Array, mask: Array) -> Array:
    w = mask.astype(x.dtype)
    while w.ndim < x.ndim:
        w = w[..., None]
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w) * (x.size / mask.size), 1e-8)


def img2mse(x: Array, y: Array, mask: Optional[Array] = None) -> Array:
    if mask is None:
        return jnp.mean((x - y) ** 2)
    m = mask.astype(x.dtype)[..., None]
    return jnp.sum((x - y) ** 2 * m) / (jnp.sum(m) * x.shape[-1] + 1e-8)


def mse2psnr(mse: Array) -> Array:
    return -10.0 * jnp.log(jnp.maximum(mse, 1e-12)) / jnp.log(10.0)


def rendering_loss(preds: Dict[str, Array], targets: Dict[str, Array],
                   use_depth: bool = False, coef: float = 1.0) -> Array:
    """losses.py:41-93. `targets['mask']` (or preds['mask']) selects valid rays."""
    mask = targets.get("mask", preds.get("mask"))
    if mask is None:
        mask = jnp.ones(preds["rgb"].shape[0], dtype=bool)
    rgb, rgb_t = preds["rgb"], targets["rgb"]

    if "beta" in preds:
        beta = preds["beta"]
        rgb_loss = masked_mean((rgb - rgb_t) ** 2 / (2.0 * beta[:, None] ** 2), mask)
        beta_loss = 3.0 + masked_mean(jnp.log(jnp.maximum(beta, 1e-8)), mask)
        loss = coef * (rgb_loss + beta_loss)
    else:
        loss = coef * masked_mean((rgb - rgb_t) ** 2, mask)

    if use_depth and "depth" in targets:
        near, far = targets["depth_range"]
        d_t = targets["depth"]
        dm = (d_t > 0) & mask
        d_t_n = to_inverse_normalized_depth(d_t, near, far)
        d_n = to_inverse_normalized_depth(preds["depth"], near, far)
        loss = loss + coef * masked_mean((d_n - d_t_n) ** 2, dm)
        if "depth_coarse" in preds:
            dc_n = to_inverse_normalized_depth(preds["depth_coarse"], near, far)
            loss = loss + coef * masked_mean((dc_n - d_t_n) ** 2, dm)

    if "feat" in preds and "feat" in targets:
        loss = loss + coef * 0.1 * masked_mean((preds["feat"] - targets["feat"]) ** 2, mask)

    return loss
