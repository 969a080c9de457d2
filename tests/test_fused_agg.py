"""Fused Pallas neighbor-aggregation kernel vs the pure-JAX query path.

The kernel (ops/fused_agg.py) replaces query()'s offsets -> embedding ->
base_mlp -> Lq=1 attention segment. Off-TPU it runs in interpret mode, so
these tests check the exact math on the CPU mesh.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.models.fields.conditional_nerf import ConditionalNeRF

from test_fields import tiny_cfg, tiny_scene


@pytest.fixture(scope="module")
def field_setup():
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


def _rays(ctx, R=6):
    pose = ctx.sv.poses[0]
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))
    d = jnp.stack([jnp.linspace(-0.1, 0.1, R), jnp.zeros(R), jnp.ones(R)], -1)
    return rays_o, d / jnp.linalg.norm(d, axis=-1, keepdims=True), pose


def test_fused_query_matches_unfused(field_setup):
    cfg, model, variables, ctx = field_setup
    xyz = ctx.fine.xyz[:40] + 0.01

    def run(fused):
        c = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, fused_query_agg=fused))
        return ConditionalNeRF(c).apply(
            variables, ctx, xyz, "fine", 8, method="query")

    f = run(True)
    u = run(False)
    np.testing.assert_allclose(np.asarray(f["feature_agg"]),
                               np.asarray(u["feature_agg"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f["feature"]),
                               np.asarray(u["feature"]),
                               rtol=2e-4, atol=2e-4)


def test_fused_render_matches_unfused(field_setup):
    cfg, model, variables, ctx = field_setup
    rays_o, rays_d, pose = _rays(ctx)

    def run(fused):
        c = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, fused_query_agg=fused))
        return ConditionalNeRF(c).apply(
            variables, ctx, rays_o, rays_d, pose, False, method="render_rays")

    f = run(True)
    u = run(False)
    np.testing.assert_allclose(np.asarray(f["rgb"]), np.asarray(u["rgb"]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f["depth"]), np.asarray(u["depth"]),
                               rtol=1e-3, atol=1e-3)


def test_fused_render_gradients_flow(field_setup):
    """custom_vjp backward (pure-JAX replay) produces finite grads through
    the fused render — the photometric pose refiner depends on this."""
    cfg, model, variables, ctx = field_setup
    rays_o, rays_d, pose = _rays(ctx, R=4)

    def loss(variables, rays_o):
        out = ConditionalNeRF(cfg).apply(
            variables, ctx, rays_o, rays_d, pose, False, method="render_rays")
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth"] ** 2)

    g_params, g_rays = jax.grad(loss, argnums=(0, 1))(variables, rays_o)
    leaves = jax.tree.leaves(g_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert np.isfinite(np.asarray(g_rays)).all()
    # the fused segment's params actually receive gradient
    gb = g_params["params"]["base_mlp"]["fc0"]["kernel"]
    assert float(jnp.sum(jnp.abs(gb))) > 0.0


def test_fused_grad_matches_unfused(field_setup):
    cfg, model, variables, ctx = field_setup
    rays_o, rays_d, pose = _rays(ctx, R=4)

    def loss(fused):
        c = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, fused_query_agg=fused))

        def f(v):
            out = ConditionalNeRF(c).apply(
                v, ctx, rays_o, rays_d, pose, False, method="render_rays")
            return jnp.sum(out["rgb"] ** 2)
        return jax.grad(f)(variables)

    gf = loss(True)["params"]["base_mlp_attn"]["w_qs"]["kernel"]
    gu = loss(False)["params"]["base_mlp_attn"]["w_qs"]["kernel"]
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                               rtol=5e-3, atol=1e-5)
