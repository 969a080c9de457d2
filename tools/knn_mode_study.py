"""End-to-end accuracy of the render KNN modes on a TRAINED model.

VERDICT round-2 item 2: the knn_proj recall study (tools/knn_recall_study.py)
was geometric only — this closes the loop to rendered PSNR and
pose-refinement error. Protocol:

  1. train one render-focused model on the synthetic box scene with
     knn_mode='flat' (reference-exact neighbor semantics during training,
     reference conditional_nerf/model.py:509-517);
  2. render HELD-OUT query views at PRODUCTION density (240x320, V=5 ->
     ~24k-point cloud; small fixtures mislead — BASELINE.md "Render-KNN
     correctness study") under knn_mode in {flat, proj(3), proj(5)} with the
     SAME trained params (knn_mode is a render-time choice; param shapes do
     not depend on it) and compare PSNR vs the analytic GT image;
  3. start pose refinement (solve/pose_refine.py, reference
     pose_optimizer.py:39-199) from a perturbed pose under each mode and
     compare the refined rot/trans error.

Results recorded in BASELINE.md; the knn_proj_window default follows from
this table (VERDICT round-2 weak #2).

Usage (real TPU, default env):
  python tools/knn_mode_study.py [train_steps]
CPU-mesh usage for a quick shape check:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/knn_mode_study.py 20 --small
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig, compute_dtype_of
from nerfloc_tpu.data import device_batch, make_query_batch, stack_batches
from nerfloc_tpu.geometry.cameras import get_rays
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from nerfloc_tpu.train import create_train_state, make_train_step
from nerfloc_tpu.utils.metrics import compute_pose_error


def base_cfg(knn_mode="flat", win=3, table_dtype="bf16"):
    return Config(
        backbone2d_fpn_dim=32, model_3d_hidden_dim=32, matcher_hidden_dim=48,
        n_views_train=3, lrate=1e-3, lrate_decay_steps=100000,
        train_pose=False,  # isolate the render path
        render=RenderConfig(N_samples=64, N_rand=64, chunk=4096,
                            knn_mode=knn_mode, knn_proj_window=win,
                            table_dtype=table_dtype),
        matching=MatchingConfig(fine_num_3d_keypoints=64,
                                coarse_num_3d_keypoints=64))


def train_model(steps: int):
    cfg = base_cfg("flat")
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    items = [device_batch(make_query_batch(n_views=3, H=64, W=96, seed=i))
             for i in range(2)]
    batch = stack_batches(items)
    rng = jax.random.PRNGKey(0)
    init_b = {k: jnp.asarray(v[0]) for k, v in batch.items()}
    params = jax.jit(model.init)(rng, init_b, rng)
    n_dev = min(2, jax.device_count())
    mesh = make_mesh(MeshSpec(data=n_dev, ray=1))
    with mesh:
        state = create_train_state(params, cfg)
        b = shard_batch(batch, mesh)
        step = make_train_step(model, cfg, mesh)
        fixed_rng = jax.random.PRNGKey(42)
        t0 = time.time()
        for i in range(steps + 1):
            state, m = step(state, b, fixed_rng)
            if i % 50 == 0:
                print(f"train step {i}: loss={float(m['loss']):.3f} "
                      f"psnr={float(m['psnr']):.2f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        params = jax.device_get(state.params)
    return params


def eval_mode(params, mode: str, win: int, eval_batches, small: bool,
              table_dtype: str = "bf16"):
    """Render held-out views + refine a perturbed pose under one knn mode."""
    cfg = base_cfg(mode, win, table_dtype)
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))

    @jax.jit
    def build_ctx(params, batch):
        return model.apply(params, batch, method=model.build_context)[0]

    @jax.jit
    def render_image(params, ctx, K, pose):
        H, W = HW
        def f(m):
            return m.model_3d.render_image(ctx, K, pose, H, W)
        return model.apply(params, method=f)

    @jax.jit
    def refine(params, ctx, pose0, K, image, uv, rng):
        from nerfloc_tpu.solve.pose_refine import refine_pose

        def render_fn(rays_o, rays_d, p):
            def f(m):
                return m.model_3d.render_rays(ctx, rays_o, rays_d, p, False)
            return model.apply(params, method=f)

        return refine_pose(render_fn, pose0, K, image, uv, rng,
                           max_steps=30, lr=1e-3)

    psnrs, rot_errs, trans_errs = [], [], []
    for batch in eval_batches:
        ctx = build_ctx(params, batch)
        HW = batch["image"].shape[:2]
        out = render_image(params, ctx, batch["K"], batch["pose"])
        rgb = np.asarray(out["rgb"], np.float32)
        gt = np.asarray(batch["image"], np.float32)
        msk = np.asarray(out["mask"], np.float32).reshape(HW[0], HW[1], 1)
        mse = float(np.sum(((rgb - gt) ** 2) * msk) / (3 * max(msk.sum(), 1)))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))

        # pose refinement from a fixed perturbation (reference
        # pose_optimizer invocation: nerf_pose_estimator.py:392-404)
        from nerfloc_tpu.geometry.se3 import se3_exp_map
        rngp = jax.random.PRNGKey(7)
        twist = jnp.asarray([0.02, -0.015, 0.01, 0.015, -0.01, 0.02])
        pose0 = se3_exp_map(twist) @ batch["pose"]
        n_px = 128 if small else 512
        uv = jnp.stack([
            jax.random.uniform(rngp, (n_px,), minval=0, maxval=HW[1] - 1.0),
            jax.random.uniform(jax.random.split(rngp)[0], (n_px,),
                               minval=0, maxval=HW[0] - 1.0)], axis=-1)
        pose_r = refine(params, ctx, pose0, batch["K"], batch["image"], uv,
                        rngp)
        r_err, t_err = compute_pose_error(pose_r, batch["pose"])
        rot_errs.append(float(r_err))
        trans_errs.append(float(t_err))

    label = mode if mode != "proj" else f"proj({win})"
    print(f"[{label}] psnr={np.mean(psnrs):.2f} "
          f"refined rot={np.mean(rot_errs):.3f}deg "
          f"trans={np.mean(trans_errs) * 100:.2f}cm "
          f"(per-view psnr {['%.2f' % p for p in psnrs]})", flush=True)
    return np.mean(psnrs), np.mean(rot_errs), np.mean(trans_errs)


def main(steps: int = 400, small: bool = False):
    params = train_model(steps)
    H, W, V = (64, 96, 3) if small else (240, 320, 5)
    eval_batches = [
        {k: jnp.asarray(v) for k, v in
         device_batch(make_query_batch(n_views=V, H=H, W=W, seed=s)).items()}
        for s in (100, 101)]
    rows = {}
    for mode, win, td in (("flat", 3, "bf16"), ("proj", 3, "bf16"),
                          ("proj", 5, "bf16"), ("proj", 3, "int8")):
        rows[(mode, win, td)] = eval_mode(params, mode, win, eval_batches,
                                          small, td)
    base = rows[("flat", 3, "bf16")]
    print("\nmode            psnr   d_psnr   rot_err  trans_err")
    for (mode, win, td), (p, r, t) in rows.items():
        label = mode if mode != "proj" else f"proj({win})"
        if td != "bf16":
            label += f"/{td}"
        print(f"{label:14s} {p:6.2f} {p - base[0]:+7.2f} {r:8.3f} "
              f"{t * 100:8.2f}cm")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    main(steps, small="--small" in sys.argv)
