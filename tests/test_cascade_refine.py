"""Cascade matching + photometric pose refinement + full-image render."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig, \
    StaticShapeConfig
from nerfloc_tpu.data import device_batch, make_query_batch, stack_batches
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator, \
    select_visible_mask
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from nerfloc_tpu.train import make_eval_step


def tiny_cfg(**kw):
    return Config(
        backbone2d_fpn_dim=16,
        model_3d_hidden_dim=16,
        matcher_hidden_dim=24,
        n_views_train=2,
        render=RenderConfig(N_samples=4, N_rand=8, chunk=64),
        matching=MatchingConfig(fine_num_3d_keypoints=16,
                                coarse_num_3d_keypoints=16),
        shapes=StaticShapeConfig(pnp_hypotheses=32, pose_refine_rays=16),
        **kw,
    )


def test_select_visible_mask():
    pose = jnp.eye(4)
    K = jnp.array([[50.0, 0, 32.0], [0, 50.0, 32.0], [0, 0, 1.0]])
    pts = jnp.array([
        [0.0, 0.0, 2.0],    # center, in front -> visible
        [0.0, 0.0, -2.0],   # behind
        [10.0, 0.0, 1.0],   # projects far outside
    ])
    m = select_visible_mask(pts, pose, K, 64, 64)
    assert m.tolist() == [True, False, False]


@pytest.mark.slow
def test_eval_with_cascade_and_refine():
    cfg = tiny_cfg(cascade_matching=True, optimize_pose=True)
    model = NerfPoseEstimator(cfg)
    items = [device_batch(make_query_batch(n_views=2, H=32, W=32, seed=i))
             for i in range(2)]
    host_batch = stack_batches(items)
    rng = jax.random.PRNGKey(0)
    init_batch = {k: jnp.asarray(v[0]) for k, v in host_batch.items()}
    params = jax.jit(model.init)(rng, init_batch, rng)

    mesh = make_mesh(MeshSpec(data=2, ray=1))
    with mesh:
        batch = shard_batch(host_batch, mesh)
        ev = make_eval_step(model, cfg, mesh)
        out = ev(params, batch, jax.random.PRNGKey(1))
    assert out["pose_pred"].shape == (2, 4, 4)
    assert np.isfinite(np.asarray(out["rot_err_deg"])).all()
    assert np.isfinite(np.asarray(out["pose_pred"])).all()


def test_refine_rejects_mask_collapse():
    """Regression for the round-4 TPU catastrophe: a refined pose whose rays
    all MISS the scene used to score masked-mean loss = 0 and be accepted as
    an 'improvement'. The count-normalized loss + valid-ray floor must
    reject it and return pose_init."""
    from nerfloc_tpu.solve.pose_refine import refine_pose

    K = jnp.array([[50.0, 0, 16.0], [0, 50.0, 16.0], [0, 0, 1.0]],
                  jnp.float32)
    pose0 = jnp.eye(4, dtype=jnp.float32)
    img = jnp.full((32, 32, 3), 0.5, jnp.float32)
    uv = jnp.stack([jnp.arange(16, dtype=jnp.float32) % 32,
                    jnp.arange(16, dtype=jnp.float32) // 1 % 32], axis=-1)

    def render_fn(rays_o, rays_d, p):
        # scene 'exists' only for cameras within 0.2 of the origin; a pose
        # that drifts away loses every ray. The rendered rgb approaches the
        # 0.5 target as the camera moves AWAY from the origin, so gradient
        # descent actively drives the pose out of the scene — after which
        # the masked-mean loss would have been exactly 0 and accepted.
        d2 = jnp.sum(p[:3, 3] ** 2)
        near = d2 < 0.04
        mask = jnp.where(near, jnp.ones(rays_o.shape[0]),
                         jnp.zeros(rays_o.shape[0]))
        rgb = jnp.full((rays_o.shape[0], 3), 0.5) - 1.0 / (1.0 + d2)
        return {"rgb": rgb, "mask": mask}

    out = refine_pose(render_fn, pose0, K, img, uv, jax.random.PRNGKey(0),
                      max_steps=4, lr=1.0)  # huge lr to force the drift
    # whether or not the optimizer drifted, the returned pose must be
    # finite and must NOT be a pose whose rays all miss
    assert np.isfinite(np.asarray(out)).all()
    near_final = float(jnp.linalg.norm(out[:3, 3])) < 0.2
    assert near_final, "refine accepted a pose outside the rendered scene"


def test_sample_refine_pixels_grid_mode():
    """'grid' mode = every dilation-th pixel (reference pose_optimizer.py:
    108-114), squeezed/wrapped to the static ray count."""
    from nerfloc_tpu.solve.pose_refine import sample_refine_pixels

    rng = jax.random.PRNGKey(0)
    # more grid points (7*10=70) than n=16: even subsample, all on the grid
    uv = np.asarray(sample_refine_pixels(rng, 64, 96, 16, mode="grid"))
    assert uv.shape == (16, 2)
    assert (uv[:, 0] % 10 == 0).all() and (uv[:, 1] % 10 == 0).all()
    assert (uv[:, 0] < 96).all() and (uv[:, 1] < 64).all()
    assert len(np.unique(uv, axis=0)) == 16  # even stride -> distinct
    # fewer grid points (2*2=4) than n=6: wraps
    uv2 = np.asarray(sample_refine_pixels(rng, 16, 16, 6, mode="grid"))
    assert uv2.shape == (6, 2)
    assert len(np.unique(uv2, axis=0)) == 4
    # random mode unchanged
    uv3 = np.asarray(sample_refine_pixels(rng, 16, 16, 6, mode="random"))
    assert uv3.shape == (6, 2)


def test_render_image_chunked():
    cfg = tiny_cfg()
    model = NerfPoseEstimator(cfg)
    item = device_batch(make_query_batch(n_views=2, H=32, W=32, seed=0))
    batch = {k: jnp.asarray(v) for k, v in item.items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, batch, rng)

    @jax.jit
    def render(params, batch):
        def f(m):
            ctx, _ = m.build_context(batch)
            return m.model_3d.render_image(ctx, batch["K"], batch["pose"],
                                           32, 32)
        return model.apply(params, method=f)

    out = render(params, batch)
    assert out["rgb"].shape == (32, 32, 3)
    assert out["depth"].shape == (32, 32)
    assert np.isfinite(np.asarray(out["rgb"])).all()
