"""Photometric pose refinement by differentiable rendering.

Rebuild of PoseOptimizer (reference: nerf_loc/models/pose_optimizer.py:22-199):
parameterize the pose as an se(3) twist, render a fixed set of sampled rays,
and minimize the masked photometric (or feature) error with Adam. Gradients
flow through the entire conditional-NeRF renderer into the pose.

TPU-native differences:
  * the optimization loop is a lax.scan over optax Adam steps — ONE compiled
    program for all `max_steps` iterations, not 50 Python-side step() calls;
  * pixel sampling is a fixed-size random subset (reference 'random' mode,
    pose_optimizer.py:115-125); 'grid' mode supported via strided indices;
  * NaN-loss abort and the loss-increase rejection (reference :157-158,
    174-176) are preserved via jnp.where selects.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..geometry.cameras import rays_for_pixels
from ..geometry.se3 import se3_exp_map, se3_log_map

Array = jax.Array


@partial(jax.jit, static_argnames=("render_fn", "max_steps", "use_feat"))
def refine_pose(render_fn: Callable, pose_init: Array, K: Array,
                rgb_image: Array, uv: Array, rng: Array,
                feat_target: Optional[Array] = None,
                max_steps: int = 50, lr: float = 1e-3,
                use_feat: bool = False) -> Array:
    """Optimize a camera-to-world pose.

    Args:
      render_fn: (rays_o [S,3], rays_d [S,3], pose [4,4]) -> dict with
        'rgb' [S,3], 'mask' [S] (and 'feat' if use_feat). Must be
        differentiable w.r.t. rays and pose.
      pose_init: [4, 4] initial c2w.
      rgb_image: [H, W, 3] target image (already scaled to the render res).
      uv: [S, 2] sampled pixel coordinates (integers as float).
    Returns: refined [4, 4] pose (or pose_init if the loss got worse / NaN).
    """
    ui = uv[:, 0].astype(jnp.int32)
    vi = uv[:, 1].astype(jnp.int32)
    rgb_target = rgb_image[vi, ui]

    twist0 = se3_log_map(pose_init)

    def loss_fn(twist):
        pose = se3_exp_map(twist)
        rays_o, rays_d = rays_for_pixels(uv, K, pose)
        out = render_fn(rays_o, rays_d, pose)
        m = out["mask"].astype(rgb_target.dtype)[:, None]
        if use_feat:
            err = (out["feat"] - feat_target) * m
        else:
            err = (out["rgb"] - rgb_target) * m
        # normalize by the VALID ray count, not the total: with jnp.mean a
        # pose whose rays all miss the scene scores loss = 0 and would be
        # "accepted" as an improvement (measured failure mode on TPU)
        n_valid = jnp.sum(m)
        loss = jnp.sum(err ** 2) / jnp.maximum(n_valid, 1.0)
        return loss, n_valid

    opt = optax.adam(lr, b1=0.9, b2=0.999)

    def step(carry, _):
        twist, opt_state = carry
        (loss, _), grad = jax.value_and_grad(loss_fn, has_aux=True)(twist)
        updates, opt_state = opt.update(grad, opt_state, twist)
        new_twist = optax.apply_updates(twist, updates)
        # NaN guard (reference :157-158): freeze on non-finite loss/grad
        ok = jnp.isfinite(loss) & jnp.all(jnp.isfinite(new_twist))
        new_twist = jnp.where(ok, new_twist, twist)
        return (new_twist, opt_state), loss

    (twist_f, _), losses = jax.lax.scan(step, (twist0, opt.init(twist0)),
                                        None, length=max_steps)
    loss0, n0 = loss_fn(twist0)
    final_loss, n_f = loss_fn(twist_f)
    # accept only if the photometric error improved AND the refined pose
    # still sees the scene (reference :174-176 rejects loss increase; the
    # valid-count floor rejects the degenerate all-rays-miss "improvement")
    improved = (final_loss <= loss0) & (n_f >= 0.5 * n0)
    pose_f = se3_exp_map(twist_f)
    return jnp.where(improved & jnp.all(jnp.isfinite(pose_f)), pose_f, pose_init)


def sample_refine_pixels(rng: Array, H: int, W: int, n: int,
                         target_mask: Optional[Array] = None,
                         mode: str = "random", dilation: int = 10) -> Array:
    """Pixel subset for the refinement rays, always exactly `n` (static
    shape). Modes mirror the reference (pose_optimizer.py:89-127):
      'random' — uniform subset (mask-aware when `target_mask` is given);
      'grid'   — every `dilation`-th pixel in both dims (reference :108-114,
                 dilation 10), evenly re-strided / wrapped to exactly n.
    """
    if mode == "grid":
        gh = (H + dilation - 1) // dilation
        gw = (W + dilation - 1) // dilation
        vv, uu = jnp.meshgrid(jnp.arange(gh) * dilation,
                              jnp.arange(gw) * dilation, indexing="ij")
        uv_all = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)  # row-major
        m = gh * gw
        if m >= n:
            sel = (jnp.arange(n) * m) // n   # even subsample of the grid
        else:
            sel = jnp.arange(n) % m          # wrap: repeat grid points
        return uv_all[sel].astype(jnp.float32)
    if target_mask is not None:
        logits = jnp.where(target_mask.reshape(-1) > 0, 0.0, -jnp.inf)
        g = jax.random.gumbel(rng, (H * W,)) + logits
        _, idx = jax.lax.top_k(g, n)
    else:
        idx = jax.random.choice(rng, H * W, (n,), replace=False)
    return jnp.stack([(idx % W).astype(jnp.float32),
                      (idx // W).astype(jnp.float32)], axis=-1)
