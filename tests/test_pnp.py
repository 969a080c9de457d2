"""On-device PnP-RANSAC tests against synthetic ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.geometry.se3 import compute_pose_error, so3_exp_map
from nerfloc_tpu.solve import ransac_pnp


def make_scene(n=256, outlier_frac=0.0, noise_px=0.0, seed=0):
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)
    R = np.asarray(so3_exp_map(jnp.asarray(rng.standard_normal(3) * 0.3, dtype=jnp.float32)))
    t = rng.standard_normal(3).astype(np.float32) * 0.5
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = t

    pts_cam = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n), rng.uniform(2.0, 6.0, n)
    ], -1).astype(np.float32)
    pts_w = (pts_cam - t) @ R  # R^T (p - t)
    uv = pts_cam @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    uv += rng.standard_normal(uv.shape) * noise_px

    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv[idx] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    c2w = np.linalg.inv(w2c)
    return (jnp.asarray(uv.astype(np.float32)), jnp.asarray(pts_w), jnp.asarray(K),
            jnp.asarray(c2w))


def test_pnp_clean():
    uv, pts_w, K, c2w_gt = make_scene()
    mask = jnp.ones(uv.shape[0], dtype=bool)
    res = ransac_pnp(uv, pts_w, mask, K, jax.random.PRNGKey(0), n_hyps=128)
    assert bool(res.success)
    rot, trans = compute_pose_error(res.c2w, c2w_gt)
    assert float(rot) < 0.1 and float(trans) < 0.005
    assert int(res.num_inliers) > 250


def test_pnp_outliers_and_noise():
    uv, pts_w, K, c2w_gt = make_scene(outlier_frac=0.4, noise_px=1.0, seed=1)
    mask = jnp.ones(uv.shape[0], dtype=bool)
    res = ransac_pnp(uv, pts_w, mask, K, jax.random.PRNGKey(1), n_hyps=512)
    assert bool(res.success)
    rot, trans = compute_pose_error(res.c2w, c2w_gt)
    assert float(rot) < 0.5 and float(trans) < 0.05


def test_pnp_respects_mask():
    uv, pts_w, K, c2w_gt = make_scene(seed=2)
    # corrupt half the points but mark them invalid
    n = uv.shape[0]
    uv = uv.at[: n // 2].set(jnp.asarray(np.random.default_rng(3).uniform(0, 640, (n // 2, 2)),
                                         dtype=uv.dtype))
    mask = jnp.arange(n) >= n // 2
    res = ransac_pnp(uv, pts_w, mask, K, jax.random.PRNGKey(2), n_hyps=256)
    assert bool(res.success)
    rot, trans = compute_pose_error(res.c2w, c2w_gt)
    assert float(rot) < 0.2 and float(trans) < 0.01
    # inliers only among masked-valid points
    assert not bool(res.inliers[: n // 2].any())


def test_pnp_p3p_survives_high_outlier_rate():
    """At 65-70% outliers, 512 P3P hypotheses (hit rate ~ w^3) succeed where
    6-point DLT (~ w^6: expected clean samples ~ 512 * 0.3^6 = 0.37) fails —
    the capability gap vs pycolmap's P3P (reference
    nerf_pose_estimator.py:557-583) that minimal='p3p' closes."""
    p3p_fails, dlt_fails = 0, 0
    for seed in range(3):
        uv, pts_w, K, c2w_gt = make_scene(n=256, outlier_frac=0.7,
                                          noise_px=1.0, seed=seed)
        mask = jnp.ones(uv.shape[0], dtype=bool)
        for minimal in ("p3p", "dlt6"):
            res = ransac_pnp(uv, pts_w, mask, K, jax.random.PRNGKey(seed),
                             n_hyps=512, minimal=minimal)
            rot, trans = compute_pose_error(res.c2w, c2w_gt)
            good = bool(res.success) and float(rot) < 1.0 and float(trans) < 0.05
            if not good:
                if minimal == "p3p":
                    p3p_fails += 1
                else:
                    dlt_fails += 1
    assert p3p_fails == 0, f"p3p failed {p3p_fails}/3 at 70% outliers"
    # documents WHY p3p is the default: dlt6 collapses here
    assert dlt_fails >= 2, f"dlt6 unexpectedly robust ({dlt_fails}/3 fails)"


def test_pnp_failure_is_finite():
    """A hopeless solve (no valid matches at all) must return success=False
    with a FINITE pose — callers select on `success` with jnp.where, so a
    NaN c2w would poison both branches."""
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(0, 640, (32, 2)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]],
                             np.float32))
    for minimal in ("p3p", "dlt6"):
        res = ransac_pnp(uv, pts, jnp.zeros(32, bool), K,
                         jax.random.PRNGKey(0), n_hyps=32, minimal=minimal)
        assert not bool(res.success)
        assert np.isfinite(np.asarray(res.c2w)).all()
        assert np.isfinite(np.asarray(res.w2c)).all()
        assert int(res.num_inliers) == 0


def test_pnp_jits_and_is_deterministic():
    uv, pts_w, K, c2w_gt = make_scene(seed=4)
    mask = jnp.ones(uv.shape[0], dtype=bool)
    r1 = ransac_pnp(uv, pts_w, mask, K, jax.random.PRNGKey(7), n_hyps=64)
    r2 = ransac_pnp(uv, pts_w, mask, K, jax.random.PRNGKey(7), n_hyps=64)
    np.testing.assert_allclose(np.asarray(r1.c2w), np.asarray(r2.c2w))


def test_count_pose_inliers_scores_candidate_poses():
    """count_pose_inliers is the eval-time cascade acceptance gate
    (train/step.py): a pose must explain the stage-1 match set at least as
    well as the stage-1 pose to replace it. GT pose counts ~all valid pairs;
    a strongly perturbed pose counts far fewer; masked pairs never count."""
    from nerfloc_tpu.solve.pnp import count_pose_inliers

    uv, pts_w, K, c2w_gt = make_scene(seed=5)
    n = uv.shape[0]
    mask = jnp.arange(n) < n - 20  # last 20 pairs invalid

    n_gt = int(count_pose_inliers(c2w_gt, uv, pts_w, mask, K, thresh_px=8.0))
    assert n_gt == n - 20  # exact projections, all valid pairs inliers

    # rotate the camera 20 deg: most reprojections leave the 8 px gate
    d = so3_exp_map(jnp.asarray([0.0, 0.35, 0.0]))
    c2w_bad = c2w_gt.at[:3, :3].set(d @ c2w_gt[:3, :3])
    n_bad = int(count_pose_inliers(c2w_bad, uv, pts_w, mask, K, thresh_px=8.0))
    assert n_bad < n_gt // 4

    # all-invalid mask -> zero, regardless of pose
    zero = int(count_pose_inliers(c2w_gt, uv, pts_w,
                                  jnp.zeros(n, bool), K))
    assert zero == 0
