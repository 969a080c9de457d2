"""Sustained training throughput at production scale on the real chip.

Production knobs match the reference train defaults
(/root/reference/nerf_loc/configs/__init__.py:29-30,55-57): V=5 support
views, fpn_dim=192, hidden=128, N_samples=64, N_rand=1024 rays,
1024 fine keypoints, uncertainty + feature rendering on. Query images
240x320 (synthetic scene geometry, data/synthetic.py).

Reports steps/s and the loss curve. Timing uses the chained-accumulator
fence (see bench.py NOTE: remote-TPU block_until_ready does not wait).

Usage: python tools/train_throughput.py [steps]
Recorded results: BASELINE.md "Training throughput at production scale" and "Train-step budget".
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig, compute_dtype_of
from nerfloc_tpu.data import device_batch, make_query_batch, stack_batches
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from nerfloc_tpu.train import create_train_state, make_train_step


def main(steps: int = 50):
    cfg = Config(
        backbone2d_fpn_dim=192,
        model_3d_hidden_dim=128,
        matcher_hidden_dim=192,
        n_views_train=5,
        render=RenderConfig(N_samples=64, N_rand=1024, chunk=2048,
                            use_render_uncertainty=True,
                            render_feature=True),
        matching=MatchingConfig(fine_num_3d_keypoints=1024,
                                coarse_num_3d_keypoints=1024),
    )
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    n_dev = len(jax.devices())
    H, W, V = 240, 320, 5
    items = [device_batch(make_query_batch(n_views=V, H=H, W=W, seed=i))
             for i in range(n_dev)]
    host_batch = stack_batches(items)
    rng = jax.random.PRNGKey(0)
    init_b = {k: jnp.asarray(v[0]) for k, v in host_batch.items()}
    # init on a smaller spatial crop: param shapes are resolution-independent
    s = 128
    small = dict(init_b)
    small["image"] = init_b["image"][:s, :s]
    small["depth"] = init_b["depth"][:s, :s]
    small["topk_images"] = init_b["topk_images"][:, :s, :s]
    small["topk_depths"] = init_b["topk_depths"][:, :s, :s]
    params = jax.jit(model.init)(rng, small, rng)

    mesh = make_mesh(MeshSpec(data=n_dev, ray=1))
    with mesh:
        state = create_train_state(params, cfg)
        batch = shard_batch(host_batch, mesh)
        step = make_train_step(model, cfg, mesh)

        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(1))
        loss0 = float(m["loss"])
        compile_s = time.perf_counter() - t0
        print(f"compile+step0: {compile_s:.1f}s  loss={loss0:.3f}")

        losses = [loss0]
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batch, jax.random.PRNGKey(2 + i))
            if (i + 1) % 10 == 0:
                # fence every 10 steps: records the loss AND bounds the
                # dispatch queue (fetch cost amortizes to ~3ms/step)
                losses.append(float(m["loss"]))
        dt = time.perf_counter() - t0
        sps = steps / dt
        print(f"{steps} steps in {dt:.1f}s -> {sps:.3f} steps/s "
              f"({sps * n_dev * 3600:.0f} queries/h on {n_dev} chip(s))")
        print("loss curve:", " ".join(f"{l:.3f}" for l in losses))
        assert all(jnp.isfinite(l) for l in losses)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
