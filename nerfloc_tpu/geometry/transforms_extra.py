"""Extra rotation/perturbation helpers.

Rebuild of the reference's small transform extras (reference:
nerf_loc/utils/transform/rotation_conversions.py:45 euler->matrix,
transform/__init__.py:14-19 get_pose_perturb,
utils/math.py:25 acos_linear_extrapolation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import se3_exp_map

Array = jax.Array


def euler_angles_to_matrix(angles: Array, convention: str = "XYZ") -> Array:
    """[..., 3] Euler angles (radians) -> [..., 3, 3] rotation."""
    def axis_rot(axis: str, a: Array) -> Array:
        c, s = jnp.cos(a), jnp.sin(a)
        one, zero = jnp.ones_like(a), jnp.zeros_like(a)
        if axis == "X":
            rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
        elif axis == "Y":
            rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
        else:
            rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    R = axis_rot(convention[0], angles[..., 0])
    for i, ax in enumerate(convention[1:], start=1):
        R = R @ axis_rot(ax, angles[..., i])
    return R


def get_pose_perturb(rng: Array, trans_sigma: float,
                     rot_sigma: float) -> Array:
    """Random SE(3) perturbation (reference transform/__init__.py:14-19) —
    used to test pose-refinement convergence from noisy initializations."""
    r1, r2 = jax.random.split(rng)
    rho = jax.random.normal(r1, (3,)) * trans_sigma
    omega = jax.random.normal(r2, (3,)) * rot_sigma
    return se3_exp_map(jnp.concatenate([rho, omega]))


def acos_linear_extrapolation(x: Array, bound: float = 1.0 - 1e-4) -> Array:
    """arccos with linear extrapolation outside [-bound, bound] so gradients
    stay finite at +-1 (reference utils/math.py:25)."""
    bound = jnp.asarray(bound, dtype=x.dtype)
    acos_b = jnp.arccos(bound)
    dacos_b = -1.0 / jnp.sqrt(1.0 - bound * bound)
    upper = acos_b + (x - bound) * dacos_b
    lower = jnp.pi - acos_b + (x + bound) * dacos_b
    inside = jnp.arccos(jnp.clip(x, -bound, bound))
    return jnp.where(x > bound, upper, jnp.where(x < -bound, lower, inside))
