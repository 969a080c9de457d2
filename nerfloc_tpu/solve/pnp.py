"""On-device PnP-RANSAC, fully jit-compiled.

Replaces the reference's pycolmap CPU call (reference:
nerf_loc/models/nerf_pose_estimator.py:557-583 — absolute_pose_estimation
with a PINHOLE camera and an 8 px RANSAC threshold, followed by inversion to
camera-to-world). Keeping the solver on-device removes the device->host
round-trip and keeps the entire localization query inside one XLA program.

Pipeline (all static shapes, vmapped over hypotheses):
  1. sample `n_hyps` minimal sets of 6 valid correspondences (Gumbel top-k
     over the match mask -> without-replacement per hypothesis),
  2. normalized-coordinate DLT (eigenvector of the 12x12 normal matrix, via
     jnp.linalg.eigh -> MXU-friendly batched eigendecomposition),
  3. SVD orthogonalization of the rotation block + cheirality fix,
  4. inlier counting at `thresh` px over all N matches,
  5. Gauss-Newton polish on the best hypothesis, IRLS-weighted by the final
     inlier set (the LO in pycolmap's LO-RANSAC).

Degenerate samples produce NaN/garbage poses; they simply score ~0 inliers
(scoring masks non-finite errors) — no control flow needed.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import hat, so3_exp_map

Array = jax.Array


class PnPResult(NamedTuple):
    c2w: Array        # [4, 4] camera-to-world pose
    w2c: Array        # [4, 4]
    inliers: Array    # [N] bool
    num_inliers: Array  # scalar int32
    success: Array    # scalar bool (>= 6 inliers)


def _normalize_pts3d(pts3d: Array, mask: Array):
    w = mask.astype(pts3d.dtype)[:, None]
    centroid = jnp.sum(pts3d * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    d = jnp.linalg.norm(pts3d - centroid, axis=-1)
    scale = jnp.sum(d * w[:, 0]) / jnp.maximum(jnp.sum(w), 1.0)
    scale = jnp.maximum(scale, 1e-6)
    return (pts3d - centroid) / scale, centroid, scale


def _dlt_w2c(X: Array, x: Array) -> Array:
    """DLT pose from >=6 correspondences in normalized camera coordinates.

    X: [M, 3] (pre-normalized 3D), x: [M, 2]. Returns w2c [3, 4] (up to the
    3D normalization, undone by the caller).
    """
    M = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((M, 1), X.dtype)], axis=-1)  # [M, 4]
    zeros = jnp.zeros_like(Xh)
    # rows: [X 0 -u*X ; 0 X -v*X]
    r1 = jnp.concatenate([Xh, zeros, -x[:, :1] * Xh], axis=-1)  # [M, 12]
    r2 = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2M, 12]
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]  # smallest eigenvalue eigenvector
    P = p.reshape(3, 4)

    # scale/orientation fix: rotation block must be orthonormal with det +1
    Rm = P[:, :3]
    U, S, Vt = jnp.linalg.svd(Rm)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], X.dtype)).at[2, 2].set(jnp.sign(detUV))
    R = U @ D @ Vt
    scale = jnp.sum(S) / 3.0 * jnp.sign(detUV)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)

    # cheirality: majority of sample points must be in front
    z = X @ R[2] + t[2]
    flip = jnp.sum(jnp.sign(z)) < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    return jnp.concatenate([R, t[:, None]], axis=-1)


def _reproj_err2(w2c34: Array, pts3d: Array, x_norm: Array):
    """Squared reprojection error in normalized coords; +inf behind camera."""
    p = pts3d @ w2c34[:, :3].T + w2c34[:, 3]
    z = p[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = p[:, :2] / safe_z[:, None]
    err = jnp.sum((uv - x_norm) ** 2, axis=-1)
    err = jnp.where(z > 1e-6, err, jnp.inf)
    return jnp.where(jnp.isfinite(err), err, jnp.inf)


def _gauss_newton(w2c34: Array, pts3d: Array, x_norm: Array, weights: Array,
                  iters: int, damping: float = 1e-6) -> Array:
    """Levenberg-damped Gauss-Newton on se(3), left-multiplied increments."""

    def step(carry, _):
        Rt = carry
        p = pts3d @ Rt[:, :3].T + Rt[:, 3]  # [N, 3]
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-8, 1e-8, p[:, 2])
        u = p[:, 0] / z
        v = p[:, 1] / z
        r = jnp.stack([u - x_norm[:, 0], v - x_norm[:, 1]], axis=-1)  # [N, 2]
        w = weights * (p[:, 2] > 1e-6)

        iz = 1.0 / z
        # d(u,v)/dp
        Jp = jnp.stack([
            jnp.stack([iz, jnp.zeros_like(iz), -u * iz], axis=-1),
            jnp.stack([jnp.zeros_like(iz), iz, -v * iz], axis=-1),
        ], axis=-2)  # [N, 2, 3]
        # dp/dxi for T <- exp(xi) T: [I | -p^]
        dpdxi = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (p.shape[0], 3, 3)),
            -hat(p),
        ], axis=-1)  # [N, 3, 6]
        J = Jp @ dpdxi  # [N, 2, 6]

        Jw = J * w[:, None, None]
        JtJ = jnp.einsum("nij,nik->jk", Jw, J) + damping * jnp.eye(6, dtype=p.dtype)
        Jtr = jnp.einsum("nij,ni->j", Jw, r)
        xi = -jnp.linalg.solve(JtJ, Jtr)
        R_delta = so3_exp_map(xi[3:])
        R_new = R_delta @ Rt[:, :3]
        t_new = R_delta @ Rt[:, 3] + xi[:3]
        new = jnp.concatenate([R_new, t_new[:, None]], axis=-1)
        good = jnp.all(jnp.isfinite(new))
        return jnp.where(good, new, Rt), None

    out, _ = jax.lax.scan(step, w2c34, None, length=iters)
    return out


@partial(jax.jit, static_argnames=("n_hyps", "sample_size", "refine_iters"))
def ransac_pnp(pts2d: Array, pts3d: Array, mask: Array, K: Array,
               rng: Array, thresh_px: float = 8.0, n_hyps: int = 512,
               sample_size: int = 6, refine_iters: int = 10) -> PnPResult:
    """RANSAC + DLT + Gauss-Newton absolute pose.

    Args:
      pts2d: [N, 2] pixel coords; pts3d: [N, 3] world; mask: [N] valid matches.
      K: [3, 3]; rng: PRNG key; thresh_px: inlier threshold in pixels.
    """
    N = pts2d.shape[0]
    dtype = pts3d.dtype
    f = (K[0, 0] + K[1, 1]) / 2.0
    x_norm = jnp.stack([
        (pts2d[:, 0] - K[0, 2]) / K[0, 0],
        (pts2d[:, 1] - K[1, 2]) / K[1, 1],
    ], axis=-1)
    thresh2 = (thresh_px / f) ** 2

    X_n, centroid, scale = _normalize_pts3d(pts3d, mask)

    # sample minimal sets: per-hypothesis Gumbel over masked noise -> top-k
    # distinct valid indices (uniform without replacement among valid).
    logits = jnp.where(mask, 0.0, -jnp.inf).astype(dtype)
    g = jax.random.gumbel(rng, (n_hyps, N), dtype=dtype) + logits[None, :]
    _, sample_idx = jax.lax.top_k(g, sample_size)  # [H, S]

    def solve_one(idx):
        Rt_n = _dlt_w2c(X_n[idx], x_norm[idx])
        # undo the 3D normalization X_n = (X - c)/s:
        #   R X_n + t_n = (R X + (s t_n - R c)) / s, and s > 0 keeps cheirality,
        # so the metric pose is exactly [R | s t_n - R c].
        R = Rt_n[:, :3]
        t = Rt_n[:, 3] * scale - R @ centroid
        return jnp.concatenate([R, t[:, None]], axis=-1)

    hyps = jax.vmap(solve_one)(sample_idx)  # [H, 3, 4]

    errs = jax.vmap(lambda h: _reproj_err2(h, pts3d, x_norm))(hyps)  # [H, N]
    valid_err = jnp.where(mask[None, :], errs, jnp.inf)
    inlier_counts = jnp.sum(valid_err < thresh2, axis=-1)  # [H]
    best = jnp.argmax(inlier_counts)
    best_h = hyps[best]

    # local optimization: GN on the best hypothesis' inliers, then recount
    w0 = (valid_err[best] < thresh2).astype(dtype)
    refined = _gauss_newton(best_h, pts3d, x_norm, w0, refine_iters)
    err_r = jnp.where(mask, _reproj_err2(refined, pts3d, x_norm), jnp.inf)
    w1 = (err_r < thresh2).astype(dtype)
    refined2 = _gauss_newton(refined, pts3d, x_norm, w1, refine_iters // 2 + 1)
    err_f = jnp.where(mask, _reproj_err2(refined2, pts3d, x_norm), jnp.inf)

    # keep the refinement only if it did not lose inliers
    n_ref = jnp.sum(err_f < thresh2)
    use_ref = n_ref >= inlier_counts[best]
    final34 = jnp.where(use_ref, refined2, best_h)
    final_err = jnp.where(use_ref, err_f, valid_err[best])

    inliers = final_err < thresh2
    num_inliers = jnp.sum(inliers).astype(jnp.int32)

    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=dtype)
    w2c = jnp.concatenate([final34, bottom], axis=0)
    R = final34[:, :3]
    c2w = jnp.concatenate(
        [jnp.concatenate([R.T, (-R.T @ final34[:, 3])[:, None]], axis=-1), bottom],
        axis=0)
    return PnPResult(c2w=c2w, w2c=w2c, inliers=inliers,
                     num_inliers=num_inliers, success=num_inliers >= 6)


def estimate_pose_pnp(mkps2d: Array, mkps3d: Array, match_mask: Array, K: Array,
                      rng: Array, ransac_thresh: float = 8.0,
                      n_hyps: int = 512) -> PnPResult:
    """Convenience wrapper mirroring NerfPoseEstimator.estimate_pose
    (reference nerf_pose_estimator.py:557-583): returns camera-to-world."""
    return ransac_pnp(mkps2d, mkps3d, match_mask, K, rng,
                      thresh_px=ransac_thresh, n_hyps=n_hyps)
