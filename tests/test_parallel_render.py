"""Ray-sharded and combined (data x ray) 2D-mesh rendering parity.

The reference renders one image per GPU with a serial chunk loop
(reference: nerf_loc/models/conditional_nerf/model.py:602-639); multi-chip
rendering does not exist there. Here the same rays rendered (a) on a single
device, (b) sharded over a (1, ray) mesh, and (c) batched over a
(data, ray) 2D mesh must agree — sharding is a layout annotation, never a
semantic change.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.data import device_batch, make_query_batch
from nerfloc_tpu.geometry.cameras import rays_for_pixels
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh
from nerfloc_tpu.parallel.render import (
    make_batched_ray_sharded_render,
    make_context_builder,
    make_ray_sharded_render,
    render_image_ray_sharded,
)


def tiny_cfg():
    return Config(
        backbone2d_fpn_dim=16,
        model_3d_hidden_dim=16,
        matcher_hidden_dim=24,
        n_views_train=2,
        render=RenderConfig(N_samples=4, N_rand=8, chunk=16),
        matching=MatchingConfig(fine_num_3d_keypoints=16,
                                coarse_num_3d_keypoints=16),
        shapes=dataclasses.replace(Config().shapes, pnp_hypotheses=32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = NerfPoseEstimator(cfg)
    batches = [
        {k: jnp.asarray(v) for k, v in
         device_batch(make_query_batch(n_views=2, H=32, W=32, seed=i)).items()}
        for i in range(2)
    ]
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, batches[0], rng)
    return cfg, model, params, batches


def _single_device_render(model, params, batch, rays_o, rays_d):
    def f(m):
        ctx, _ = m.build_context(batch)
        return m.model_3d.render_rays(ctx, rays_o, rays_d, batch["pose"],
                                      train=False)
    return jax.jit(lambda p: model.apply(p, method=f))(params)


def _rays(batch, n_rays, lo=2.0, hi=29.0):
    uv = jnp.stack([jnp.linspace(lo, hi, n_rays),
                    jnp.linspace(hi, lo, n_rays)], axis=-1)
    return rays_for_pixels(uv, batch["K"], batch["pose"])


def test_ray_sharded_matches_single_device(setup):
    cfg, model, params, batches = setup
    batch = batches[0]
    rays_o, rays_d = _rays(batch, 16)
    ref = _single_device_render(model, params, batch, rays_o, rays_d)

    mesh = make_mesh(MeshSpec(data=1, ray=4))
    build_ctx = make_context_builder(model, mesh)
    render = make_ray_sharded_render(model, cfg, mesh)
    ctx = build_ctx(params, batch)
    out = render(params, ctx, rays_o, rays_d, batch["pose"])

    for k in ("rgb", "depth"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4)


def test_batched_2d_mesh_matches_per_query(setup):
    """(data=2, ray=4) 2D mesh: two queries, each with its rays sharded —
    the combined strategy VERDICT r3 item 5 asked for. Must equal the two
    independent single-device renders."""
    cfg, model, params, batches = setup
    n_rays = 16
    rays = [_rays(b, n_rays) for b in batches]
    refs = [_single_device_render(model, params, b, ro, rd)
            for b, (ro, rd) in zip(batches, rays)]

    mesh = make_mesh(MeshSpec(data=2, ray=4))
    build_ctx = make_context_builder(model, mesh)
    ctxs = [build_ctx(params, b) for b in batches]
    ctx_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ctxs)
    rays_o = jnp.stack([r[0] for r in rays])          # [Q, R, 3]
    rays_d = jnp.stack([r[1] for r in rays])
    poses = jnp.stack([b["pose"] for b in batches])   # [Q, 4, 4]

    render = make_batched_ray_sharded_render(model, cfg, mesh)
    out = render(params, ctx_stacked, rays_o, rays_d, poses)

    assert out["rgb"].shape == (2, n_rays, 3)
    for q in range(2):
        for k in ("rgb", "depth"):
            np.testing.assert_allclose(np.asarray(out[k][q]),
                                       np.asarray(refs[q][k]),
                                       rtol=1e-4, atol=1e-4)


def test_render_image_ray_sharded_matches_chunk_loop(setup):
    """Full-image multi-chip render (reachable from cli.test --ray_shards)
    equals the single-device lax.map chunk loop."""
    cfg, model, params, batches = setup
    batch = batches[0]
    H = W = 8

    @jax.jit
    def render_single(params):
        def f(m):
            ctx, _ = m.build_context(batch)
            return m.model_3d.render_image(ctx, batch["K"], batch["pose"],
                                           H, W)
        return model.apply(params, method=f)

    ref = render_single(params)

    mesh = make_mesh(MeshSpec(data=1, ray=4))
    build_ctx = make_context_builder(model, mesh)
    ctx = build_ctx(params, batch)
    out = render_image_ray_sharded(model, cfg, params, ctx, batch["K"],
                                   batch["pose"], H, W, mesh)

    assert out["rgb"].shape == (H, W, 3)
    for k in ("rgb", "depth"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4)
