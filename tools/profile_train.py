"""Train-step segment budget at production shapes (VERDICT r4 item 6).

The render path got three rounds of roofline work; this measures where the
TRAIN step (fwd+bwd, reference pl/model.py:43-90 equivalents) spends its
time, by timing the full jitted train step against variants with one loss
branch disabled — the delta attributes that branch's fwd+bwd cost,
including its share of build_context and the backward scatter-adds through
the packed gather tables.

Variants (config-only, same model family as tools/train_throughput.py):
  full          everything on (production: V=5, 240x320, N_rand=1024,
                dense-64, uncertainty + feature render, 1024 fine kps)
  no_nerf       train_nerf=False  -> delta = render loss fwd+bwd
  no_pose       train_pose=False  -> delta = matching losses fwd+bwd
  ref_depth     both off          -> remainder = ref-depth loss +
                build_context + optimizer
  half_rays     N_rand=512        -> ray-count scaling of the render loss

Usage (real TPU, default env; ~15 min):  python tools/profile_train.py [steps]
Results: BASELINE.md "Train-step budget".
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nerfloc_tpu.configs import (Config, MatchingConfig, RenderConfig,
                                 compute_dtype_of)
from nerfloc_tpu.data import device_batch, make_query_batch, stack_batches
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
from nerfloc_tpu.train import create_train_state, make_train_step


def base_cfg():
    return Config(
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


VARIANTS = {
    "full": lambda c: c,
    "no_nerf": lambda c: dataclasses.replace(c, train_nerf=False),
    "no_pose": lambda c: dataclasses.replace(c, train_pose=False),
    "ref_depth": lambda c: dataclasses.replace(c, train_nerf=False,
                                               train_pose=False),
    "half_rays": lambda c: dataclasses.replace(
        c, render=dataclasses.replace(c.render, N_rand=512)),
}


def main(steps: int = 30):
    H, W, V = 240, 320, 5
    items = [device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0))]
    host_batch = stack_batches(items)
    rng = jax.random.PRNGKey(0)
    init_b = {k: jnp.asarray(v[0]) for k, v in host_batch.items()}
    s = 128
    small = dict(init_b)
    small["image"] = init_b["image"][:s, :s]
    small["depth"] = init_b["depth"][:s, :s]
    small["topk_images"] = init_b["topk_images"][:, :s, :s]
    small["topk_depths"] = init_b["topk_depths"][:, :s, :s]

    mesh = make_mesh(MeshSpec(data=1, ray=1))
    results = {}
    params0 = None
    for name, mod in VARIANTS.items():
        cfg = mod(base_cfg())
        model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
        if params0 is None:
            params0 = jax.jit(model.init)(rng, small, rng)
        with mesh:
            state = create_train_state(jax.tree.map(jnp.copy, params0), cfg)
            batch = shard_batch(host_batch, mesh)
            step = make_train_step(model, cfg, mesh)
            t0 = time.perf_counter()
            state, m = step(state, batch, jax.random.PRNGKey(1))
            l0 = float(m["loss"])  # fence
            compile_s = time.perf_counter() - t0
            # steady state: fence every 10 via the loss fetch
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                for i in range(steps):
                    state, m = step(state, batch,
                                    jax.random.PRNGKey(2 + i))
                    if (i + 1) % 10 == 0:
                        float(m["loss"])
                best = min(best, (time.perf_counter() - t0) / steps)
        results[name] = best * 1000
        print(f"{name:<10} {best * 1000:7.1f} ms/step "
              f"({1.0 / best:.3f} steps/s)  compile {compile_s:.0f}s "
              f"loss0 {l0:.3f}", flush=True)

    if {"full", "no_nerf", "no_pose", "ref_depth"} <= results.keys():
        f = results["full"]
        print(f"\nsegment attribution (of {f:.1f} ms full step):")
        print(f"  render loss fwd+bwd : {f - results['no_nerf']:7.1f} ms")
        print(f"  matching fwd+bwd    : {f - results['no_pose']:7.1f} ms")
        print(f"  base (ctx+refdepth+opt): {results['ref_depth']:7.1f} ms")
        if "half_rays" in results:
            print(f"  render ray-scaling  : full={f:.1f} "
                  f"half_rays={results['half_rays']:.1f} "
                  f"(delta {f - results['half_rays']:.1f} ms per 512 rays)")
    print({k: round(v, 1) for k, v in results.items()})


def _scalarize(tree) -> jnp.ndarray:
    """Sum every floating leaf — keeps all outputs alive (defeats DCE)."""
    tot = jnp.float32(0.0)
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def fine(steps: int = 30):
    """Decompose the shared-context block the variant ablations can't.

    The branch ablations in main() leave ~55% of the full step
    unattributed: work shared by the render and matching losses
    (build_context fwd+bwd — backbone on V+1 images, DepthFusionNet,
    neural-point confidence). These probes split it:

      step_fwd   full loss_fn forward only        -> bwd = full - fwd
      ctx_fwd    build_context forward
      ctx_grad   build_context fwd + bwd
      bb_fwd     backbone (extract_2d) on V+1 imgs
      bb_grad    backbone fwd + bwd
    """
    H, W, V = 240, 320, 5
    b = device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0))
    b = {k: jnp.asarray(v) for k, v in b.items()}
    rng = jax.random.PRNGKey(0)
    cfg = base_cfg()
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    small = dict(b)
    s = 128
    small["image"] = b["image"][:s, :s]
    small["depth"] = b["depth"][:s, :s]
    small["topk_images"] = b["topk_images"][:, :s, :s]
    small["topk_depths"] = b["topk_depths"][:, :s, :s]
    params = jax.jit(model.init)(rng, small, rng)
    imgs6 = jnp.concatenate([b["image"][None], b["topk_images"]], axis=0)

    def step_fwd(p, r):
        return _scalarize(model.apply(p, b, r, method=model.train_forward))

    def ctx_fwd(p):
        return _scalarize(model.apply(p, b, method=model.build_context))

    def bb_fwd(p):
        return _scalarize(model.apply(p, imgs6, method=model.extract_2d))

    probes = {
        "step_fwd": jax.jit(step_fwd),
        "ctx_fwd": jax.jit(ctx_fwd),
        "ctx_grad": jax.jit(lambda p: _scalarize(jax.grad(ctx_fwd)(p))),
        "bb_fwd": jax.jit(bb_fwd),
        "bb_grad": jax.jit(lambda p: _scalarize(jax.grad(bb_fwd)(p))),
    }
    for name, fn in probes.items():
        args = (params, rng) if name == "step_fwd" else (params,)
        t0 = time.perf_counter()
        float(fn(*args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(steps):
                out = fn(*args)
                if (i + 1) % 10 == 0:
                    float(out)
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"{name:<10} {best * 1000:7.1f} ms  compile {compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--fine":
        fine(int(sys.argv[2]) if len(sys.argv) > 2 else 30)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
