"""Quality check: NeuRay-guided hierarchical sampling vs dense sampling.

The reference's guided sampling (conditional_nerf/model.py:487-496:
predict_weights_from_neuray -> sample_pdf) ADDS N_importance samples on top
of N_samples. The TPU-relevant question is the inverse: can guided
placement at a REDUCED total budget match dense-64 render quality? The
coarse NeuRay weight pass costs only the 32-ch dist-decoder MLP (no
base_mlp/attention/RayUnet), so halving the full-query sample count nearly
halves the render call.

Protocol: overfit two identical models on the same synthetic scene batch,
one at N_samples=64 flat, one at N_samples=16 + N_importance=16 (guided),
same steps/lr/rng, then compare the render-loss PSNR trajectory. (RayUnet
layer-norm shapes depend on the total sample count — as in the reference —
so sampling config is a training-time choice and each config trains its
own model.)

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/guided_sampling_check.py [steps]
Recorded results: BASELINE.md "Guided / reduced sampling".
"""
import sys

import jax
import jax.numpy as jnp

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
from nerfloc_tpu.data import device_batch, make_query_batch, stack_batches
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from nerfloc_tpu.train import create_train_state, make_train_step


def run(name: str, n_samples: int, n_importance: int, steps: int,
        n_guide: int = 64):
    cfg = Config(backbone2d_fpn_dim=32, model_3d_hidden_dim=32,
                 matcher_hidden_dim=48, n_views_train=3, lrate=1e-3,
                 lrate_decay_steps=100000,
                 train_pose=False,  # isolate the render path
                 render=RenderConfig(N_samples=n_samples,
                                     N_importance=n_importance,
                                     N_rand=64, N_guide=n_guide),
                 matching=MatchingConfig(
                     fine_num_3d_keypoints=64, coarse_num_3d_keypoints=64))
    model = NerfPoseEstimator(cfg)
    items = [device_batch(make_query_batch(n_views=3, H=64, W=96, seed=i))
             for i in range(2)]
    batch = stack_batches(items)
    rng = jax.random.PRNGKey(0)
    init_b = {k: jnp.asarray(v[0]) for k, v in batch.items()}
    params = jax.jit(model.init)(rng, init_b, rng)
    mesh = make_mesh(MeshSpec(data=2, ray=1))
    with mesh:
        state = create_train_state(params, cfg)
        b = shard_batch(batch, mesh)
        step = make_train_step(model, cfg, mesh)
        fixed_rng = jax.random.PRNGKey(42)
        psnrs = []
        for i in range(steps + 1):
            state, m = step(state, b, fixed_rng)
            if i % 25 == 0:
                p = float(m["psnr"])
                psnrs.append(p)
                print(f"[{name}] step {i}: loss={float(m['loss']):.3f} "
                      f"render={float(m['render_loss']):.4f} psnr={p:.2f}",
                      flush=True)
        return psnrs


def main(steps: int = 300, guide_sweep: bool = False):
    if guide_sweep:
        # PSNR side of the N_guide trade (throughput side:
        # tools/profile_int8_tables.py --guide-sweep)
        rows = {ng: run(f"guided-16+16 g{ng}", 16, 16, steps, ng)
                for ng in (64, 48, 32)}
        print("\nfinal PSNR by N_guide:",
              {ng: p[-1] for ng, p in rows.items()})
        return
    dense = run("dense-64", 64, 0, steps)
    guided = run("guided-16+16", 16, 16, steps)
    flat32 = run("flat-32", 32, 0, steps)
    print("\nfinal PSNR: dense-64 =", dense[-1],
          " guided-16+16 =", guided[-1], " flat-32 =", flat32[-1])
    print("full-query samples per ray: 64 vs 32 vs 32 "
          "(guided adds one cheap dist-decoder pass over 64 coarse depths)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 300,
         guide_sweep="--guide-sweep" in sys.argv)
