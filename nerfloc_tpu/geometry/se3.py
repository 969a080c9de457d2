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


def _hat_sq(w: Array, theta2: Array) -> Array:
    """W^2 for W = hat(w), via the exact identity W^2 = w w^T - |w|^2 I.

    Elementwise (outer product), NOT `W @ W`: on TPU a 3x3 jnp.matmul runs
    on the MXU with bf16 inputs, which at rotation angles near pi corrupts
    the Rodrigues terms by several degrees (measured up to ~6 deg exp(log(R))
    roundtrip error on v5e before this change)."""
    outer = w[..., :, None] * w[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), outer.shape)
    return outer - theta2[..., None, None] * eye


def so3_exp_map(w: Array) -> Array:
    """Rodrigues formula: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = _hat_sq(w, theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log_map(R: Array) -> Array:
    """[..., 3, 3] rotation -> [..., 3] axis-angle, robust at θ=π.

    The classic w = (R - Rᵀ)∨ · θ/(2 sin θ) form amplifies any noise in R by
    ~1/sin θ; at θ within ~1° of π that is a 100-1000x blow-up that can push
    |ω| past 2π, where the V⁻¹ in se3_log_map is singular (measured on the
    e2e study: outward-looking orbit poses all sit at 178-180°, and the
    amplified bf16 noise sent the refiner's twist translation to ~1e7 m).
    For θ > 3π/4 we instead read the axis from the symmetric part:
    R + Rᵀ = 2cosθ I + 2(1-cosθ) aaᵀ, which is well-conditioned at π.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
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
    w_sin = w_skew * scale[..., None]

    # near-π branch: aaᵀ = (S - cosθ I) / (1 - cosθ) with S = (R + Rᵀ)/2
    one_minus = jnp.maximum(1.0 - cos_theta, _EPS)[..., None]
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    a2 = jnp.clip((diag - cos_theta[..., None]) / one_minus, 0.0, 1.0)
    a_abs = jnp.sqrt(jnp.maximum(a2, 1e-12))  # grad-safe at a2=0
    # off-diagonal products fix relative signs: (1-cosθ) a_k a_i = S_ki (i≠k)
    S01 = (R[..., 0, 1] + R[..., 1, 0]) / 2.0
    S02 = (R[..., 0, 2] + R[..., 2, 0]) / 2.0
    S12 = (R[..., 1, 2] + R[..., 2, 1]) / 2.0
    k = jnp.argmax(a2, axis=-1)  # best-conditioned pivot axis
    sign0 = jnp.select(
        [k == 0, k == 1], [jnp.ones_like(S01), jnp.sign(S01)], jnp.sign(S02))
    sign1 = jnp.select(
        [k == 0, k == 1], [jnp.sign(S01), jnp.ones_like(S01)], jnp.sign(S12))
    sign2 = jnp.select(
        [k == 0, k == 1], [jnp.sign(S02), jnp.sign(S12)], jnp.ones_like(S02))
    # sign(x)=0 at x=0 would zero a component; snap to +1 there
    def nz(s):
        return jnp.where(s == 0, 1.0, s)
    a = a_abs * jnp.stack([nz(sign0), nz(sign1), nz(sign2)], axis=-1)
    # overall sign from the skew part (w_skew = 2 sinθ a, sinθ >= 0 on [0,π]);
    # at exactly π the sign is immaterial (exp(±πa) coincide)
    flip = jnp.sum(a * w_skew, axis=-1, keepdims=True) < 0.0
    a = jnp.where(flip, -a, a)
    w_pi = theta[..., None] * a

    return jnp.where((cos_theta < -0.70710678)[..., None], w_pi, w_sin)


def _apply_left_jacobian(w: Array, rho: Array) -> Array:
    """V(ω) rho, elementwise (cross products — no 3x3 MXU matmul):
    V rho = rho + B (w x rho) + C (w x (w x rho))."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    c1 = jnp.cross(w, rho)
    c2 = jnp.cross(w, c1)
    return rho + B[..., None] * c1 + C[..., None] * c2


def _apply_left_jacobian_inv(w: Array, t: Array) -> Array:
    """V(ω)^-1 t, elementwise: t - 0.5 (w x t) + cot (w x (w x t))."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    half_theta = theta / 2.0
    cot = jnp.where(
        theta2 < 1e-8,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS))
        / jnp.maximum(theta2, _EPS),
    )
    c1 = jnp.cross(w, t)
    c2 = jnp.cross(w, c1)
    return t - 0.5 * c1 + cot[..., None] * c2


def se3_exp_map(twist: Array) -> Array:
    """[..., 6] twist (rho, omega) -> [..., 4, 4] transform."""
    rho, w = twist[..., :3], twist[..., 3:]
    R = so3_exp_map(w)
    t = _apply_left_jacobian(w, rho)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=twist.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log_map(T: Array) -> Array:
    """[..., 4, 4] transform -> [..., 6] twist (rho, omega)."""
    w = so3_log_map(T[..., :3, :3])
    rho = _apply_left_jacobian_inv(w, T[..., :3, 3])
    return jnp.concatenate([rho, w], axis=-1)


def compute_pose_error(T_est: Array, T_gt: Array) -> tuple[Array, Array]:
    """(rotation error in degrees, translation L2) — matches the reference's
    compute_pose_error (nerf_loc/utils/metrics.py:14-33)."""
    R1 = T_est[..., :3, :3]
    R2 = T_gt[..., :3, :3]
    # trace(R2 R1^T) = sum(R2 * R1) elementwise — avoids a 3x3 jnp.matmul,
    # which the TPU MXU would run with bf16 inputs (~0.5 deg metric noise)
    trace = jnp.sum(R2 * R1, axis=(-2, -1))
    trace = jnp.clip(trace, -1.0, 3.0)
    angular_err = jnp.degrees(jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)))
    trans_err = jnp.linalg.norm(T_est[..., :3, 3] - T_gt[..., :3, 3], axis=-1)
    return angular_err, trans_err
