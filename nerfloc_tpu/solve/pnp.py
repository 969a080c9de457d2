"""On-device PnP-RANSAC, fully jit-compiled.

Replaces the reference's pycolmap CPU call (reference:
nerf_loc/models/nerf_pose_estimator.py:557-583 — absolute_pose_estimation
with a PINHOLE camera and an 8 px RANSAC threshold, followed by inversion to
camera-to-world). Keeping the solver on-device removes the device->host
round-trip and keeps the entire localization query inside one XLA program.

Pipeline (all static shapes, vmapped over hypotheses):
  1. sample `n_hyps` minimal sets of valid correspondences (Gumbel top-k
     over the match mask -> without-replacement per hypothesis),
  2. minimal solver — default `minimal='p3p'`: closed-form Grunert P3P on
     3-point sets (quartic in the distance ratio, solved by a real-arithmetic
     resolvent-cubic factorization + Newton polish; up to 4 pose candidates
     per sample via Kabsch alignment). Per-hypothesis success scales as w^3
     at inlier rate w — matching pycolmap's P3P used by the reference — vs
     w^6 for the `minimal='dlt6'` 6-point DLT (kept as an option),
  3. inlier counting at `thresh` px over all N matches,
  4. Gauss-Newton polish on the best hypothesis, IRLS-weighted by the final
     inlier set (the LO in pycolmap's LO-RANSAC).

Degenerate samples produce NaN/garbage poses; they simply score ~0 inliers
(scoring masks non-finite errors) — no control flow needed.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


def _cubic_max_real_root(a2: Array, a1: Array, a0: Array) -> Array:
    """Largest real root of m^3 + a2 m^2 + a1 m + a0, real arithmetic only.

    Shifted to the depressed cubic t^3 + p t + q, then the trigonometric
    (three real roots) / hyperbolic (one real root) closed forms. All branch
    arguments are clamped so untaken jnp.where branches stay finite.
    """
    p = a1 - a2 * a2 / 3.0
    q = 2.0 * a2 ** 3 / 27.0 - a2 * a1 / 3.0 + a0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # three real roots (disc <= 0 implies p < 0): max is k=0 of the trig form
    pn = jnp.minimum(p, -1e-12)
    rp = jnp.sqrt(-pn / 3.0)
    cos_arg = jnp.clip(3.0 * q / (2.0 * pn) * jnp.sqrt(-3.0 / pn), -1.0, 1.0)
    t_trig = 2.0 * rp * jnp.cos(jnp.arccos(cos_arg) / 3.0)

    # one real root, p < 0: hyperbolic cosine form
    ch_arg = jnp.maximum(-3.0 * jnp.abs(q) / (2.0 * pn) * jnp.sqrt(-3.0 / pn), 1.0)
    t_cosh = -2.0 * jnp.sign(q) * rp * jnp.cosh(jnp.arccosh(ch_arg) / 3.0)

    # one real root, p > 0: hyperbolic sine form
    pp = jnp.maximum(p, 1e-12)
    sh_arg = 3.0 * q / (2.0 * pp) * jnp.sqrt(3.0 / pp)
    t_sinh = -2.0 * jnp.sqrt(pp / 3.0) * jnp.sinh(jnp.arcsinh(sh_arg) / 3.0)

    t_one = jnp.where(p > 0.0, t_sinh, t_cosh)
    t_tiny = jnp.cbrt(-q)  # p ~ 0
    t = jnp.where(disc <= 0.0, t_trig, t_one)
    t = jnp.where(jnp.abs(p) < 1e-10, t_tiny, t)
    return t - a2 / 3.0


def _quartic_roots(c: Array) -> Array:
    """All (up to 4) real roots of c[4] x^4 + ... + c[0]; complex-pair slots
    come back NaN. Ferrari factorization into two quadratics via the largest
    real resolvent-cubic root, then 2 Newton polish steps on the original
    quartic (recovers f32 precision lost in the closed form)."""
    c4 = jnp.where(jnp.abs(c[4]) < 1e-12, 1e-12, c[4])
    b, cc, d, e = c[3] / c4, c[2] / c4, c[1] / c4, c[0] / c4
    p = cc - 3.0 * b * b / 8.0
    q = d - b * cc / 2.0 + b ** 3 / 8.0
    r = e - b * d / 4.0 + b * b * cc / 16.0 - 3.0 * b ** 4 / 256.0

    # resolvent: 8m^3 + 8p m^2 + (2p^2 - 8r) m - q^2 = 0
    m = _cubic_max_real_root(p, p * p / 4.0 - r, -q * q / 8.0)
    s = jnp.sqrt(jnp.maximum(2.0 * m, 0.0))
    s_safe = jnp.maximum(s, 1e-9)
    qs = q / (2.0 * s_safe)
    # y^2 - s y + (p/2 + m + qs) = 0  and  y^2 + s y + (p/2 + m - qs) = 0
    d1 = s * s - 4.0 * (p / 2.0 + m + qs)
    d2 = s * s - 4.0 * (p / 2.0 + m - qs)
    sq1 = jnp.sqrt(d1)  # NaN when the pair is complex — filtered by caller
    sq2 = jnp.sqrt(d2)
    y_gen = jnp.stack([(s + sq1) / 2.0, (s - sq1) / 2.0,
                       (-s + sq2) / 2.0, (-s - sq2) / 2.0])

    # biquadratic fallback (q ~ 0 -> s ~ 0): y^2 = (-p +/- sqrt(p^2-4r))/2
    db = jnp.sqrt(p * p - 4.0 * r)
    z1 = (-p + db) / 2.0
    z2 = (-p - db) / 2.0
    y_biq = jnp.stack([jnp.sqrt(z1), -jnp.sqrt(z1), jnp.sqrt(z2), -jnp.sqrt(z2)])

    y = jnp.where(jnp.abs(q) < 1e-9, y_biq, y_gen)
    x = y - b / 4.0

    def newton(x, _):
        f = (((c[4] * x + c[3]) * x + c[2]) * x + c[1]) * x + c[0]
        fp = ((4.0 * c[4] * x + 3.0 * c[3]) * x + 2.0 * c[2]) * x + c[1]
        fp = jnp.where(jnp.abs(fp) < 1e-12, 1e-12, fp)
        return x - f / fp, None

    x, _ = jax.lax.scan(newton, x, None, length=2)
    return x


# Vandermonde inverse for quartic-coefficient extraction by evaluation at
# nodes v in {-2,-1,0,1,2}: coeffs = _VAND_INV @ F(nodes).
# MUST be host (numpy) constants, never jnp: a module-level jnp.array created
# while this module is first imported inside a jit trace becomes a tracer of
# THAT trace and leaks into every later trace (UnexpectedTracerError — the
# exact failure that invalidated BENCH_r04).
_P3P_NODES = np.array([-2.0, -1.0, 0.0, 1.0, 2.0], dtype=np.float32)
_VAND_INV = np.linalg.inv(
    np.vander(np.array([-2.0, -1.0, 0.0, 1.0, 2.0]), 5,
              increasing=True)).astype(np.float32)


def _kabsch_w2c(Pw: Array, Pc: Array) -> Array:
    """Rigid [R|t] with Pc ~= R Pw + t from 3 exact correspondences."""
    cw = jnp.mean(Pw, axis=0)
    ccm = jnp.mean(Pc, axis=0)
    H = (Pw - cw).T @ (Pc - ccm)
    U, _, Vt = jnp.linalg.svd(H)
    VU = Vt.T @ U.T
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], Pw.dtype)).at[2, 2].set(
        jnp.sign(jnp.linalg.det(VU)))
    R = Vt.T @ D @ U.T
    t = ccm - R @ cw
    return jnp.concatenate([R, t[:, None]], axis=-1)


def _p3p_w2c(Pw: Array, xn: Array) -> Array:
    """Grunert P3P: up to 4 w2c [3,4] candidates from 3 points (NaN-padded).

    Pw: [3, 3] world points; xn: [3, 2] normalized image coords. The quartic
    in the distance ratio v = s3/s1 is assembled numerically: F(v) (the
    elimination polynomial) is evaluated at 5 nodes and its coefficients are
    recovered through a fixed Vandermonde inverse — no hand-expanded
    coefficient formulas to get wrong. Replaces pycolmap's P3P stage
    (reference nerf_loc/models/nerf_pose_estimator.py:557-583).
    """
    f = jnp.concatenate([xn, jnp.ones((3, 1), xn.dtype)], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # bearing vectors

    a2 = jnp.sum((Pw[1] - Pw[2]) ** 2)
    b2 = jnp.sum((Pw[0] - Pw[2]) ** 2)
    c2 = jnp.sum((Pw[0] - Pw[1]) ** 2)
    b2 = jnp.maximum(b2, 1e-12)
    ca = jnp.dot(f[1], f[2])
    cb = jnp.dot(f[0], f[2])
    cg = jnp.dot(f[0], f[1])
    A = a2 / b2
    B = c2 / b2

    def num(v):
        return 1.0 - v * v + (A - B) * (1.0 + v * v - 2.0 * v * cb)

    def den(v):
        return 2.0 * (cg - v * ca)

    def F(v):
        n, dd = num(v), den(v)
        return (n * n - 2.0 * cg * n * dd
                + (1.0 - B * (1.0 + v * v - 2.0 * v * cb)) * dd * dd)

    coeffs = _VAND_INV.astype(Pw.dtype) @ jax.vmap(F)(_P3P_NODES.astype(Pw.dtype))
    v = _quartic_roots(coeffs)  # [4]

    u = num(v) / jnp.where(jnp.abs(den(v)) < 1e-12, 1e-12, den(v))
    s1 = jnp.sqrt(b2) / jnp.sqrt(jnp.maximum(1.0 + v * v - 2.0 * v * cb, 1e-12))
    s2 = u * s1
    s3 = v * s1
    ok = (jnp.isfinite(v) & (v > 1e-6) & (u > 1e-6)
          & jnp.isfinite(s1) & (s1 > 1e-6))

    # Newton-polish the distances on the three law-of-cosines constraints —
    # the quartic closed form leaves an f32 precision tail (~9% of samples
    # land >1e-2 off); 3 Newton steps on (s1,s2,s3) crush it.
    def polish(carry, _):
        s1, s2, s3 = carry
        r = jnp.stack([
            s2 * s2 + s3 * s3 - 2.0 * s2 * s3 * ca - a2,
            s1 * s1 + s3 * s3 - 2.0 * s1 * s3 * cb - b2,
            s1 * s1 + s2 * s2 - 2.0 * s1 * s2 * cg - c2,
        ], axis=-1)  # [4, 3]
        z = jnp.zeros_like(s1)
        J = jnp.stack([
            jnp.stack([z, 2 * s2 - 2 * s3 * ca, 2 * s3 - 2 * s2 * ca], -1),
            jnp.stack([2 * s1 - 2 * s3 * cb, z, 2 * s3 - 2 * s1 * cb], -1),
            jnp.stack([2 * s1 - 2 * s2 * cg, 2 * s2 - 2 * s1 * cg, z], -1),
        ], axis=-2)  # [4, 3, 3]
        ds = jnp.linalg.solve(J, r[..., None])[..., 0]  # [4, 3]
        good = jnp.all(jnp.isfinite(ds), axis=-1)
        s1n = jnp.where(good, s1 - ds[:, 0], s1)
        s2n = jnp.where(good, s2 - ds[:, 1], s2)
        s3n = jnp.where(good, s3 - ds[:, 2], s3)
        return (s1n, s2n, s3n), None

    (s1, s2, s3), _ = jax.lax.scan(
        polish, (jnp.where(ok, s1, 1.0), jnp.where(ok, s2, 1.0),
                 jnp.where(ok, s3, 1.0)), None, length=3)

    def one(s1i, s2i, s3i, oki):
        Pc = jnp.stack([s1i * f[0], s2i * f[1], s3i * f[2]])
        Rt = _kabsch_w2c(Pw, Pc)
        return jnp.where(oki, Rt, jnp.full_like(Rt, jnp.nan))

    return jax.vmap(one)(s1, s2, s3, ok)  # [4, 3, 4]


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


@partial(jax.jit, static_argnames=("n_hyps", "sample_size", "refine_iters",
                                   "minimal"))
def ransac_pnp(pts2d: Array, pts3d: Array, mask: Array, K: Array,
               rng: Array, thresh_px: float = 8.0, n_hyps: int = 512,
               sample_size: int = 6, refine_iters: int = 10,
               minimal: str = "p3p") -> PnPResult:
    """RANSAC + minimal solver + Gauss-Newton absolute pose.

    Args:
      pts2d: [N, 2] pixel coords; pts3d: [N, 3] world; mask: [N] valid matches.
      K: [3, 3]; rng: PRNG key; thresh_px: inlier threshold in pixels.
      minimal: 'p3p' (3-point Grunert, up to 4 poses/sample — matches the
        hypothesis efficiency of pycolmap's P3P used by the reference) or
        'dlt6' (6-point DLT, `sample_size` controls the set size).
    """
    # Pose-solver matmuls are tiny (3x3 blocks, [N,3] projections, 6x6
    # normal equations) but numerically load-bearing: on TPU the MXU would
    # run them with bf16 inputs, corrupting R by ~1e-2 per GN iteration —
    # enough to break the near-π se3 log map downstream (see geometry/se3).
    # Forcing f32 here costs nothing at these shapes.
    with jax.default_matmul_precision("highest"):
        return _ransac_pnp_impl(pts2d, pts3d, mask, K, rng, thresh_px,
                                n_hyps, sample_size, refine_iters, minimal)


def _ransac_pnp_impl(pts2d, pts3d, mask, K, rng, thresh_px, n_hyps,
                     sample_size, refine_iters, minimal) -> PnPResult:
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
    n_min = 3 if minimal == "p3p" else sample_size
    logits = jnp.where(mask, 0.0, -jnp.inf).astype(dtype)
    g = jax.random.gumbel(rng, (n_hyps, N), dtype=dtype) + logits[None, :]
    _, sample_idx = jax.lax.top_k(g, n_min)  # [H, S]

    def undo_norm(Rt_n):
        # undo the 3D normalization X_n = (X - c)/s:
        #   R X_n + t_n = (R X + (s t_n - R c)) / s, and s > 0 keeps cheirality,
        # so the metric pose is exactly [R | s t_n - R c].
        R = Rt_n[:, :3]
        t = Rt_n[:, 3] * scale - R @ centroid
        return jnp.concatenate([R, t[:, None]], axis=-1)

    if minimal == "p3p":
        def solve_one(idx):
            return jax.vmap(undo_norm)(_p3p_w2c(X_n[idx], x_norm[idx]))
        hyps = jax.vmap(solve_one)(sample_idx).reshape(-1, 3, 4)  # [4H, 3, 4]
    else:
        def solve_one(idx):
            return undo_norm(_dlt_w2c(X_n[idx], x_norm[idx]))
        hyps = jax.vmap(solve_one)(sample_idx)  # [H, 3, 4]

    errs = jax.vmap(lambda h: _reproj_err2(h, pts3d, x_norm))(hyps)  # [H, N]
    valid_err = jnp.where(mask[None, :], errs, jnp.inf)
    inlier_counts = jnp.sum(valid_err < thresh2, axis=-1)  # [H]
    # degenerate p3p candidates are NaN by design — never argmax onto one
    hyp_finite = jnp.all(jnp.isfinite(hyps.reshape(hyps.shape[0], -1)), -1)
    best = jnp.argmax(jnp.where(hyp_finite, inlier_counts, -1))
    best_h = jnp.where(hyp_finite[best], hyps[best],
                       jnp.eye(3, 4, dtype=dtype))

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

    # NaN-safe output contract: callers select on `success` with jnp.where,
    # so a failed solve must still return a FINITE pose (identity)
    finite = jnp.all(jnp.isfinite(final34))
    final34 = jnp.where(finite, final34, jnp.eye(3, 4, dtype=dtype))
    final_err = jnp.where(finite, final_err, jnp.inf)

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


def count_pose_inliers(c2w: Array, pts2d: Array, pts3d: Array, mask: Array,
                       K: Array, thresh_px: float = 8.0) -> Array:
    """Reprojection-inlier count of an ARBITRARY pose over a match set, using
    the same normalized-coordinate error/threshold as ransac_pnp — lets two
    candidate poses (e.g. stage-1 vs cascade, nerf_pose_estimator.py:330-349)
    be scored on identical data.
    """
    with jax.default_matmul_precision("highest"):
        R = c2w[:3, :3]
        t = c2w[:3, 3]
        w2c34 = jnp.concatenate([R.T, (-R.T @ t)[:, None]], axis=-1)
        f = (K[0, 0] + K[1, 1]) / 2.0
        x_norm = jnp.stack([
            (pts2d[:, 0] - K[0, 2]) / K[0, 0],
            (pts2d[:, 1] - K[1, 2]) / K[1, 1],
        ], axis=-1)
        err = _reproj_err2(w2c34, pts3d.astype(x_norm.dtype), x_norm)
        thresh2 = (thresh_px / f) ** 2
        return jnp.sum((err < thresh2) & mask).astype(jnp.int32)
