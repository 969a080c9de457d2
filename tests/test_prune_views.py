"""Visibility-pruned support views in the render path (render.prune_views).

The pruning lever (BASELINE.md render roofline, 'fewer views per sample')
gathers the wide per-view feature rows only for each sample's top-k most
visible views. k >= V must reproduce the unpruned render exactly (top-k then
spans all views and every fusion op is permutation-invariant over the view
axis); k < V must stay finite and close on a structured scene.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.data import device_batch, make_query_batch
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator


def _cfg(prune_k: int):
    return Config(backbone2d_fpn_dim=16, model_3d_hidden_dim=16,
                  matcher_hidden_dim=24, n_views_train=3,
                  render=RenderConfig(N_samples=8, N_rand=8, knn_mode="proj",
                                      prune_views=prune_k),
                  matching=MatchingConfig(fine_num_3d_keypoints=32,
                                          coarse_num_3d_keypoints=32))


@pytest.fixture(scope="module")
def setup():
    cfg0 = _cfg(0)
    model0 = NerfPoseEstimator(cfg0)
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=3, H=64, W=96,
                                           seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model0.init)(rng, batch, rng)
    return params, batch


def _render(params, batch, prune_k: int):
    cfg = _cfg(prune_k)
    model = NerfPoseEstimator(cfg)

    @jax.jit
    def run(params, batch):
        def f(m):
            ctx, _ = m.build_context(batch)
            rays_o = jnp.broadcast_to(batch["pose"][:3, 3], (16, 3))
            t = jnp.linspace(-0.2, 0.2, 16)[:, None]
            d = batch["pose"][:3, 2][None, :] + t * batch["pose"][:3, 0][None, :]
            rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            return m.model_3d.render_rays(ctx, rays_o, rays_d,
                                          batch["pose"], train=False)
        return model.apply(params, method=f)

    return run(params, batch)


def test_prune_k_equals_V_is_exact(setup):
    params, batch = setup
    base = _render(params, batch, 0)
    full = _render(params, batch, 3)  # k == V: same math, reordered views
    for key in ("rgb", "depth", "weights", "mask"):
        np.testing.assert_allclose(np.asarray(base[key], np.float32),
                                   np.asarray(full[key], np.float32),
                                   rtol=2e-4, atol=2e-5, err_msg=key)


def test_prune_k2_finite_and_close(setup):
    params, batch = setup
    base = _render(params, batch, 0)
    pruned = _render(params, batch, 2)
    rgb_b = np.asarray(base["rgb"], np.float32)
    rgb_p = np.asarray(pruned["rgb"], np.float32)
    assert np.isfinite(rgb_p).all()
    assert np.isfinite(np.asarray(pruned["depth"], np.float32)).all()
    # dropping the LEAST visible view moves an untrained render only a
    # little: pins that the selection really keys on decoded visibility
    assert np.abs(rgb_p - rgb_b).max() < 0.25, np.abs(rgb_p - rgb_b).max()
    np.testing.assert_array_equal(np.asarray(base["mask"]),
                                  np.asarray(pruned["mask"]))


def test_prune_builds_expected_tables(setup):
    params, batch = setup
    model = NerfPoseEstimator(_cfg(2))
    ctx = jax.jit(
        lambda p, b: model.apply(p, b, method=model.build_context)[0]
    )(params, batch)
    assert ctx.feat_fine_packed is not None
    assert ctx.fused_fine_packed is None
    assert ctx.vis_corner_packed is not None  # stage-1 decode table
    C = ctx.feat_fine_src.shape[-1]
    assert ctx.feat_fine_packed.shape[-1] == 4 * C  # no vis channels


def test_packed_bilinear_sample_selected_matches_views():
    """The per-sample-view sampler equals the all-views sampler at the
    selected (view, uv) pairs."""
    from nerfloc_tpu.ops.interp import (pack_bilinear_corners,
                                        packed_bilinear_sample_selected,
                                        packed_bilinear_sample_views)

    rng = np.random.default_rng(0)
    V, H, W, C = 4, 10, 12, 8
    feats = jnp.asarray(rng.standard_normal((V, H, W, C)), jnp.float32)
    packed = pack_bilinear_corners(feats)
    N, k = 50, 2
    uv_all = jnp.asarray(
        rng.uniform(0, [W - 1, H - 1], (V, N, 2)), jnp.float32)
    all_s = packed_bilinear_sample_views(packed, H, W, uv_all)  # [V, N, C]
    sel = jnp.asarray(rng.integers(0, V, (N, k)), jnp.int32)
    uv_sel = jnp.take_along_axis(uv_all.transpose(1, 0, 2), sel[..., None],
                                 axis=1)
    got = packed_bilinear_sample_selected(packed, H, W, uv_sel, sel)
    want = jnp.take_along_axis(all_s.transpose(1, 0, 2), sel[..., None],
                               axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
