"""SO(3)/SE(3) exponential and logarithm maps, pure JAX.

Replaces the reference's pytorch3d-copied maps
(reference: nerf_loc/utils/transform/se3.py:29-199, so3.py:19-309) with
Taylor-guarded closed forms that are jit/vmap/grad-safe (no data-dependent
branching; small-angle limits via jnp.where with safe operands).

Convention: column vectors, T = [[R, t], [0, 1]], twist = (rho, omega) with
exp([rho, omega]) = [[exp(omega^), V(omega) rho], [0, 1]].
Used by the photometric pose refiner (solve/pose_refine.py), the equivalent of
the reference's PoseOptimizer (models/pose_optimizer.py:75-134).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8


def hat(w: Array) -> Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: Array):
    """Returns (A, B, C) = (sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³) with Taylor
    fallbacks near θ=0, computed from θ² only (grad-safe at zero)."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    return A, B, C


def so3_exp_map(w: Array) -> Array:
    """Rodrigues formula: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log_map(R: Array) -> Array:
    """[..., 3, 3] rotation -> [..., 3] axis-angle.

    Accurate away from θ=π (sufficient for pose refinement steps, which
    operate on small perturbations; reference relies on the same regime).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / jnp.maximum(2.0 * sin_theta, _EPS))
    return w_skew * scale[..., None]


def _left_jacobian(w: Array) -> Array:
    """V(ω) such that exp-map translation = V rho."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def _left_jacobian_inv(w: Array) -> Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    half_theta = theta / 2.0
    cot = jnp.where(
        theta2 < 1e-8,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS))
        / jnp.maximum(theta2, _EPS),
    )
    return eye - 0.5 * W + cot[..., None, None] * W2


def se3_exp_map(twist: Array) -> Array:
    """[..., 6] twist (rho, omega) -> [..., 4, 4] transform."""
    rho, w = twist[..., :3], twist[..., 3:]
    R = so3_exp_map(w)
    t = (_left_jacobian(w) @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=twist.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log_map(T: Array) -> Array:
    """[..., 4, 4] transform -> [..., 6] twist (rho, omega)."""
    w = so3_log_map(T[..., :3, :3])
    rho = (_left_jacobian_inv(w) @ T[..., :3, 3:])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def compute_pose_error(T_est: Array, T_gt: Array) -> tuple[Array, Array]:
    """(rotation error in degrees, translation L2) — matches the reference's
    compute_pose_error (nerf_loc/utils/metrics.py:14-33)."""
    R1 = T_est[..., :3, :3]
    R2 = T_gt[..., :3, :3]
    rot_diff = R2 @ R1.swapaxes(-1, -2)
    trace = rot_diff[..., 0, 0] + rot_diff[..., 1, 1] + rot_diff[..., 2, 2]
    trace = jnp.clip(trace, -1.0, 3.0)
    angular_err = jnp.degrees(jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)))
    trans_err = jnp.linalg.norm(T_est[..., :3, 3] - T_gt[..., :3, 3], axis=-1)
    return angular_err, trans_err
