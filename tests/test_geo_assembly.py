"""One-hot candidate-table neighbor assembly vs the packed gather path.

The render hot loop (geo_assembly='onehot', configs/__init__.py) selects
neighbor geometry+features from per-ray candidate tables with one-hot MXU
matmuls; this must be EXACTLY the gather it replaces (1.0 * value in the
operand dtypes).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.models.fields.conditional_nerf import ConditionalNeRF
from nerfloc_tpu.ops.knn import knn_rays

from test_fields import tiny_cfg, tiny_scene


def test_knn_rays_candidates_consistent():
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    pts = jax.random.normal(ks[0], (500, 3))
    rays_o = jax.random.normal(ks[1], (6, 3)) * 0.1
    rays_d = jax.random.normal(ks[2], (6, 3))
    z = jnp.broadcast_to(jnp.linspace(0.5, 3.0, 16), (6, 16))
    mask = jnp.arange(500) < 450

    idx0 = knn_rays(rays_o, rays_d, z, pts, K=4, points_mask=mask,
                    n_candidates=64)
    idx, cand, local = knn_rays(rays_o, rays_d, z, pts, K=4,
                                points_mask=mask, n_candidates=64,
                                return_candidates=True)
    np.testing.assert_array_equal(np.asarray(idx0), np.asarray(idx))
    # local indices address the candidate table consistently
    recon = jnp.take_along_axis(cand[:, None, :].repeat(16, 1),
                                local, axis=2)
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(idx))


def test_render_onehot_matches_gather():
    cfg = tiny_cfg()
    model = ConditionalNeRF(cfg)
    images, depths, poses, Ks, feat_c, feat_f = tiny_scene()
    near, far = jnp.float32(0.5), jnp.float32(4.0)
    variables = model.init(jax.random.PRNGKey(0), images, depths, poses, Ks,
                           near, far, feat_c, feat_f, 8, 4,
                           jax.random.PRNGKey(7))
    ctx = model.apply(variables, images, depths, poses, Ks, near, far,
                      feat_c, feat_f, 8, 4, method="build_scene_context")
    pose = ctx.sv.poses[0]
    R = 5
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))
    d = jnp.stack([jnp.linspace(-0.1, 0.1, R), jnp.zeros(R), jnp.ones(R)], -1)
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def run(mode):
        c = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, geo_assembly=mode,
                                            knn_mode="ray"))
        return ConditionalNeRF(c).apply(
            variables, ctx, rays_o, rays_d, pose, False, method="render_rays")

    # the hi/mid/lo bf16 split reconstructs f32 geometry to ~24 mantissa
    # bits (rel err ~2^-22); amplified through the frequency embedding this
    # shows up as O(1e-5) drift — 0.05 mm in depth units at scene scale
    a = run("onehot")
    b = run("gather")
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a["depth"]), np.asarray(b["depth"]),
                               rtol=2e-4, atol=2e-4)
