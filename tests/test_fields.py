"""Shape/finite-ness tests for the conditional-NeRF field stack on tiny scenes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.models.fields.conditional_nerf import ConditionalNeRF, sample_pdf_det
from nerfloc_tpu.models.fields.neuray import (
    from_inverse_normalized_depth,
    to_inverse_normalized_depth,
)


def tiny_cfg():
    return Config(
        backbone2d_fpn_dim=16,
        model_3d_hidden_dim=32,
        matcher_hidden_dim=48,
        render=RenderConfig(N_samples=8, N_rand=16, chunk=32),
        matching=MatchingConfig(fine_num_3d_keypoints=32, coarse_num_3d_keypoints=32),
    )


def tiny_scene(V=3, H=32, W=32, C=16, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(V, H, W, 3)).astype(np.float32)
    depths = rng.uniform(1.0, 3.0, size=(V, H, W)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        poses[v, 0, 3] = 0.1 * v
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], dtype=np.float32)
    Ks = np.tile(K, (V, 1, 1))
    feat_c = rng.standard_normal((V, H // 8, W // 8, C)).astype(np.float32)
    feat_f = rng.standard_normal((V, H // 4, W // 4, C)).astype(np.float32)
    return (jnp.asarray(images), jnp.asarray(depths), jnp.asarray(poses),
            jnp.asarray(Ks), jnp.asarray(feat_c), jnp.asarray(feat_f))


@pytest.fixture(scope="module")
def field_and_ctx():
    cfg = tiny_cfg()
    model = ConditionalNeRF(cfg)
    images, depths, poses, Ks, feat_c, feat_f = tiny_scene()
    near, far = jnp.float32(0.5), jnp.float32(4.0)

    variables = model.init(jax.random.PRNGKey(0), images, depths, poses, Ks,
                           near, far, feat_c, feat_f, 8, 4,
                           jax.random.PRNGKey(7))
    ctx = model.apply(variables, images, depths, poses, Ks, near, far,
                      feat_c, feat_f, 8, 4, method="build_scene_context")
    return cfg, model, variables, ctx


def test_scene_context_shapes(field_and_ctx):
    cfg, model, variables, ctx = field_and_ctx
    V, H, W = 3, 32, 32
    Pc, Pf = V * (H // 8) * (W // 8), V * (H // 4) * (W // 4)
    assert ctx.coarse.xyz.shape == (Pc, 3)
    assert ctx.fine.xyz.shape == (Pf, 3)
    assert ctx.coarse.feature.shape == (Pc, 3 + 16)
    assert ctx.fine.confidence.shape == (Pf, 1)
    assert ctx.coarse.kp_score.shape == (Pc, 1)
    assert ctx.sv.vis_featmaps.shape[0] == V and ctx.sv.vis_featmaps.shape[-1] == 32
    assert bool(ctx.coarse.mask.all())  # all depths > 0 in the tiny scene
    assert np.isfinite(np.asarray(ctx.fine.confidence)).all()


def test_query_coarse_sampled(field_and_ctx):
    cfg, model, variables, ctx = field_and_ctx
    desc, pts, pts_ndc = model.apply(
        variables, ctx, None, jax.random.PRNGKey(1), method="query_coarse")
    N = cfg.matching.fine_num_3d_keypoints
    assert desc.shape == (N, cfg.matcher_hidden_dim)
    assert pts.shape == (N, 3) and pts_ndc.shape == (N, 3)
    assert np.isfinite(np.asarray(desc)).all()


def test_query_fine_at_points(field_and_ctx):
    cfg, model, variables, ctx = field_and_ctx
    pts = ctx.fine.xyz[:20]
    desc = model.apply(variables, ctx, pts, method="query_fine")
    assert desc.shape == (20, cfg.matcher_hidden_dim)
    assert np.isfinite(np.asarray(desc)).all()


def test_render_rays(field_and_ctx):
    cfg, model, variables, ctx = field_and_ctx
    R = 4
    pose = ctx.sv.poses[0]
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))
    d = jnp.array([[0.05, 0.0, 1.0], [0.0, 0.05, 1.0], [0.0, 0.0, 1.0],
                   [-0.05, 0.0, 1.0]])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = model.apply(variables, ctx, rays_o, rays_d, pose, True,
                      method="render_rays")
    assert out["rgb"].shape == (R, 3)
    assert out["depth"].shape == (R,)
    assert out["weights"].shape == (R, cfg.render.N_samples)
    assert out["beta"].shape == (R,)
    assert out["feat"].shape == (R, cfg.backbone2d_fpn_dim)
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    # blended rgb is a convex combination of support pixels -> within [0, 1]
    assert rgb.min() >= -1e-4 and rgb.max() <= 1.0 + 1e-4
    depth = np.asarray(out["depth"])
    assert (depth >= 0).all() and (depth <= 4.0 + 1e-3).all()


def test_render_rays_grad_to_pose_inputs(field_and_ctx):
    """Gradient must flow through rendering into ray origins/directions —
    required by the photometric pose refiner (reference pose_optimizer.py)."""
    cfg, model, variables, ctx = field_and_ctx
    pose = ctx.sv.poses[0]

    def loss_fn(delta):
        rays_o = jnp.broadcast_to(pose[:3, 3], (2, 3)) + delta
        rays_d = jnp.array([[0.0, 0.0, 1.0], [0.05, 0.0, 1.0]])
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        out = model.apply(variables, ctx, rays_o, rays_d, pose, False,
                          method="render_rays")
        return jnp.sum(out["rgb"] ** 2)

    g = jax.grad(loss_fn)(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_inverse_depth_roundtrip():
    near, far = jnp.float32(0.5), jnp.float32(5.0)
    d = jnp.linspace(0.6, 4.9, 32)
    dn = to_inverse_normalized_depth(d, near, far)
    assert float(dn.min()) >= 0 and float(dn.max()) <= 1
    d2 = from_inverse_normalized_depth(dn, near, far)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), rtol=1e-4)


def test_sample_pdf_concentrates():
    bins = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 9), (4, 9))
    w = jnp.zeros((4, 8)).at[:, 4].set(100.0)
    samples = sample_pdf_det(bins, w, 16)
    s = np.asarray(samples)
    # bin 4 spans [1.5, 1.625]; nearly all samples should land inside
    frac = ((s >= 1.45) & (s <= 1.7)).mean()
    assert frac > 0.8

def test_render_ray_knn_matches_flat(field_and_ctx):
    """knn_mode='ray' (ray-coherent candidate pruning) must reproduce the
    flat per-sample KNN render to float tolerance on a scene where the
    candidate set is exhaustive (n_candidates >= cloud size)."""
    cfg, model, variables, ctx = field_and_ctx
    R = 6
    pose = ctx.sv.poses[0]
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))
    d = jnp.stack([jnp.linspace(-0.1, 0.1, R), jnp.zeros(R), jnp.ones(R)], -1)
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    cfg_flat = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, knn_mode="flat"))
    cfg_ray = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, knn_mode="ray",
            knn_candidates=ctx.fine.xyz.shape[0]))
    out_flat = ConditionalNeRF(cfg_flat).apply(
        variables, ctx, rays_o, rays_d, pose, False, method="render_rays")
    out_ray = ConditionalNeRF(cfg_ray).apply(
        variables, ctx, rays_o, rays_d, pose, False, method="render_rays")
    np.testing.assert_allclose(np.asarray(out_ray["rgb"]),
                               np.asarray(out_flat["rgb"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_ray["depth"]),
                               np.asarray(out_flat["depth"]), atol=2e-5)


def test_render_ray_knn_pruned_close(field_and_ctx):
    """With a realistic (pruned) candidate budget the render must stay very
    close to the exact-KNN render — neighbor recall losses only perturb the
    farthest of K=8 neighbors, whose aggregation weight ~ 1/dist is minimal."""
    cfg, model, variables, ctx = field_and_ctx
    R = 6
    pose = ctx.sv.poses[0]
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))
    d = jnp.stack([jnp.linspace(-0.1, 0.1, R), jnp.zeros(R), jnp.ones(R)], -1)
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    cfg_flat = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, knn_mode="flat"))
    cfg_ray = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, knn_mode="ray"))
    out_flat = ConditionalNeRF(cfg_flat).apply(
        variables, ctx, rays_o, rays_d, pose, False, method="render_rays")
    out_ray = ConditionalNeRF(cfg_ray).apply(
        variables, ctx, rays_o, rays_d, pose, False, method="render_rays")
    np.testing.assert_allclose(np.asarray(out_ray["rgb"]),
                               np.asarray(out_flat["rgb"]), atol=5e-3)


def test_sample_keypoints_never_returns_masked_points():
    """When valid points < num, the all-(-inf) Gumbel tie must not leak
    padding slots: invalid selections are remapped to the best valid point."""
    from nerfloc_tpu.models.fields.context import NeuralPoints

    P, num = 16, 8
    mask = jnp.zeros(P, bool).at[jnp.array([2, 5])].set(True)  # 2 valid < 8
    pts = NeuralPoints(
        xyz=jnp.arange(P * 3, dtype=jnp.float32).reshape(P, 3),
        xyz_ndc=jnp.zeros((P, 3)), feature=jnp.zeros((P, 4)),
        confidence=jnp.ones((P, 1)), direction=jnp.zeros((P, 4)),
        mask=mask, kp_score=jnp.full((P, 1), 0.5))

    class _Ctx:
        coarse = pts

    _, _, idx = ConditionalNeRF.sample_keypoints(
        None, _Ctx(), jax.random.PRNGKey(0), num)
    assert np.isin(np.asarray(idx), [2, 5]).all()
