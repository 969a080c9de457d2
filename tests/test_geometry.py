import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.geometry import (
    backproject_depth,
    camera_project,
    compute_pose_error,
    get_rays,
    project_points,
    se3_exp_map,
    se3_log_map,
    so3_exp_map,
    so3_log_map,
)
from nerfloc_tpu.geometry.cameras import invert_pose, rays_for_pixels, world_to_camera
from nerfloc_tpu.geometry.embedder import Embedder, nerf_embedder, position_embedding_sine


def random_pose(rng):
    w = rng.standard_normal(3) * 0.8
    t = rng.standard_normal(3)
    R = np.asarray(so3_exp_map(jnp.asarray(w, dtype=jnp.float32)))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


K = jnp.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], dtype=jnp.float32)


def test_project_backproject_roundtrip():
    rng = np.random.default_rng(0)
    c2w = jnp.asarray(random_pose(rng))
    depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(96, 128)).astype(np.float32))
    pts_w, valid = backproject_depth(depth, K, c2w)
    assert bool(valid.all())
    pts_cam = world_to_camera(c2w, pts_w.reshape(-1, 3))
    u, v, z = camera_project(pts_cam, K)
    uu, vv = np.meshgrid(np.arange(128), np.arange(96), indexing="xy")
    np.testing.assert_allclose(np.asarray(z).reshape(96, 128), np.asarray(depth), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u).reshape(96, 128), uu, atol=2e-2)
    np.testing.assert_allclose(np.asarray(v).reshape(96, 128), vv, atol=2e-2)


def test_invert_pose():
    rng = np.random.default_rng(1)
    T = jnp.asarray(random_pose(rng))
    np.testing.assert_allclose(np.asarray(invert_pose(T) @ T), np.eye(4), atol=1e-5)


def test_get_rays_hits_depth_points():
    rng = np.random.default_rng(2)
    c2w = jnp.asarray(random_pose(rng))
    H, W = 24, 32
    depth = jnp.asarray(rng.uniform(1.0, 2.0, size=(H, W)).astype(np.float32))
    rays_o, rays_d = get_rays(H, W, K, c2w)
    pts_w, _ = backproject_depth(depth, K, c2w)
    # ray direction is normalized; z-depth = t * cos factor. Verify colinearity.
    delta = pts_w - rays_o
    delta_n = delta / jnp.linalg.norm(delta, axis=-1, keepdims=True)
    dots = jnp.sum(delta_n * rays_d, axis=-1)
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-5)


def test_rays_for_pixels_matches_grid():
    rng = np.random.default_rng(3)
    c2w = jnp.asarray(random_pose(rng))
    H, W = 16, 20
    rays_o, rays_d = get_rays(H, W, K, c2w)
    uv = jnp.array([[3.0, 5.0], [10.0, 2.0], [19.0, 15.0]])
    o2, d2 = rays_for_pixels(uv, K, c2w)
    for i, (u, v) in enumerate([(3, 5), (10, 2), (19, 15)]):
        np.testing.assert_allclose(np.asarray(d2[i]), np.asarray(rays_d[v, u]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(o2[i]), np.asarray(rays_o[v, u]), atol=1e-6)


def test_project_points_masks():
    c2w = jnp.eye(4)
    pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [100.0, 0.0, 1.0]])
    uv, z, valid = project_points(pts, K, c2w, H=96, W=128)
    assert bool(valid[0]) and not bool(valid[1]) and not bool(valid[2])
    np.testing.assert_allclose(np.asarray(uv[0]), [64.0, 48.0], atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    # keep |w| < pi: the axis-angle parameterization is only unique there
    w = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32) * 0.7)
    R = so3_exp_map(w)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    w2 = so3_log_map(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)
    # for arbitrary rotations, exp(log(R)) must still reproduce R
    w_big = jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32) * 2.0)
    R_big = so3_exp_map(w_big)
    R_rt = so3_exp_map(so3_log_map(R_big))
    np.testing.assert_allclose(np.asarray(R_rt), np.asarray(R_big), atol=2e-3)


def test_so3_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0]])
    R = so3_exp_map(w)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    g = jax.grad(lambda x: so3_exp_map(x).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    tw = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32) * 0.5)
    T = se3_exp_map(tw)
    tw2 = se3_log_map(T)
    np.testing.assert_allclose(np.asarray(tw2), np.asarray(tw), atol=1e-3)


def test_so3_log_near_pi():
    """θ≈π regression: the sin-form log map amplifies R noise by ~1/sinθ
    there (the e2e study's outward-looking orbit poses all sit at 178-180°
    and the blow-up sent the pose refiner's twist to ~1e7 m). The diagonal
    form must keep the roundtrip tight and |ω| <= π."""
    rng = np.random.default_rng(11)
    axes = rng.standard_normal((24, 3)).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    # angles straddling π, incl. exactly π and within 3e-3 of it
    angles = np.concatenate([
        np.full(8, np.pi), np.pi - rng.uniform(1e-4, 3e-3, 8),
        np.pi - rng.uniform(3e-3, 0.6, 8)]).astype(np.float32)
    w = jnp.asarray(axes * angles[:, None])
    R = so3_exp_map(w)
    w_rt = so3_log_map(R)
    # |ω| must never exceed π (past it V⁻¹ heads toward its 2π singularity)
    assert float(jnp.max(jnp.linalg.norm(w_rt, axis=-1))) <= np.pi + 1e-4
    R_rt = so3_exp_map(w_rt)
    np.testing.assert_allclose(np.asarray(R_rt), np.asarray(R), atol=2e-3)
    # se3: translation must survive the near-π roundtrip (the failure mode
    # was rho exploding through the V⁻¹ cotangent)
    t = rng.standard_normal((24, 3)).astype(np.float32) * 0.4
    T = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
    T[:, :3, :3] = np.asarray(R)
    T[:, :3, 3] = t
    T_rt = se3_exp_map(se3_log_map(jnp.asarray(T)))
    np.testing.assert_allclose(np.asarray(T_rt), T, atol=2e-3)


def test_pose_error_zero_and_known():
    T = jnp.eye(4)
    rot, trans = compute_pose_error(T, T)
    assert float(rot) < 1e-3 and float(trans) == 0.0
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = np.asarray(so3_exp_map(jnp.array([0.0, 0.0, np.deg2rad(10.0)])))
    T2[:3, 3] = [0.3, 0.0, 0.4]
    rot, trans = compute_pose_error(jnp.asarray(T2), T)
    np.testing.assert_allclose(float(rot), 10.0, atol=1e-3)
    np.testing.assert_allclose(float(trans), 0.5, atol=1e-5)


def test_nerf_embedder_matches_reference_formula():
    emb, dim = nerf_embedder(multires=4)
    x = jnp.array([[0.3, -0.2, 0.7]])
    out = emb(x)
    assert out.shape == (1, dim) and dim == 3 * (1 + 2 * 4)
    np.testing.assert_allclose(np.asarray(out[0, :3]), np.asarray(x[0]))
    # first frequency block is sin(x * 2^0) then cos(x * 2^0)
    np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin(np.asarray(x[0])), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 6:9]), np.cos(np.asarray(x[0])), atol=1e-6)
    # last block uses 2^(m-1) = 8
    np.testing.assert_allclose(np.asarray(out[0, -3:]), np.cos(8 * np.asarray(x[0])), atol=1e-5)


def test_position_embedding_sine_shape_and_range():
    pe = position_embedding_sine(8, 10, num_pos_feats=96)
    assert pe.shape == (8, 10, 2 * 2 * 48)
    assert np.abs(np.asarray(pe)).max() <= 1.0 + 1e-6
