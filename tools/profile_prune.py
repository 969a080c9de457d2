"""A/B profile of visibility-pruned support views (render.prune_views).

Single process, scan-mode steady state at bench shapes (4096 rays x
N_samples, V=5, 240x320) — the same measurement protocol as bench.py, so
numbers are comparable within this run only (axon tunnel variance ~±10%
across sessions; see BASELINE.md measurement notes).

Usage (real TPU, default env):  python tools/profile_prune.py [k ...]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def spin_up(ms: float = 3000.0):
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: jnp.sum(x @ x))
    t0 = time.perf_counter()
    while (time.perf_counter() - t0) * 1000 < ms:
        float(f(x))


def main():
    from nerfloc_tpu.configs import (Config, MatchingConfig, RenderConfig,
                                     compute_dtype_of)
    from nerfloc_tpu.data import device_batch, make_query_batch
    from nerfloc_tpu.geometry.cameras import rays_for_pixels
    from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator

    ks = [int(a) for a in sys.argv[1:]] or [0, 3, 4]
    variants = []
    for k in ks:
        variants.append((f"dense64_k{k}", dict(N_samples=64, N_rand=1024,
                                               chunk=2048, prune_views=k)))
    for k in ks:
        variants.append((f"guided16+16_k{k}",
                         dict(N_samples=16, N_importance=16, N_rand=1024,
                              chunk=2048, prune_views=k)))

    H, W, V = 240, 320, 5
    n_rays, iters = 4096, 20
    batch = None
    params_cache = {}
    results = {}
    for name, rkw in variants:
        cfg = Config(backbone2d_fpn_dim=192, model_3d_hidden_dim=128,
                     matcher_hidden_dim=192,
                     render=RenderConfig(**rkw),
                     matching=MatchingConfig(fine_num_3d_keypoints=1024))
        model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
        if batch is None:
            batch = {k_: jnp.asarray(v) for k_, v in
                     device_batch(make_query_batch(n_views=V, H=H, W=W,
                                                   seed=0)).items()}
            rng = jax.random.PRNGKey(0)
            rngs = jax.random.split(rng, 2)
            uv_all = jnp.stack([
                jax.random.uniform(rngs[0], (iters, n_rays), minval=0,
                                   maxval=W - 1),
                jax.random.uniform(rngs[1], (iters, n_rays), minval=0,
                                   maxval=H - 1)], axis=-1)
            ro_all, rd_all = jax.vmap(
                lambda uv: rays_for_pixels(uv, batch["K"],
                                           batch["pose"]))(uv_all)
        # params depend only on sample-count (RayUnet norm shapes), not on k
        pkey = (rkw.get("N_samples"), rkw.get("N_importance", 0))
        if pkey not in params_cache:
            sys.path.insert(0, REPO)
            from bench import _shrink_init_batch

            params_cache[pkey] = jax.jit(model.init)(
                jax.random.PRNGKey(0), _shrink_init_batch(batch),
                jax.random.PRNGKey(0))
        params = params_cache[pkey]

        ctx = jax.jit(lambda p, b, m=model: m.apply(
            p, b, method=m.build_context)[0])(params, batch)

        @jax.jit
        def render_scan(params, ctx, ro_all, rd_all, pose, m=model):
            def body(acc, rays):
                ro, rd = rays

                def f(mm):
                    return mm.model_3d.render_rays(ctx, ro, rd, pose, False)
                out = m.apply(params, method=f)
                return acc + jnp.sum(out["rgb"]) + jnp.sum(out["depth"]), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (ro_all, rd_all))
            return acc

        float(render_scan(params, ctx, ro_all, rd_all, batch["pose"]))
        spin_up(2000.0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(render_scan(params, ctx, ro_all, rd_all, batch["pose"]))
            best = min(best, time.perf_counter() - t0)
        rps = n_rays * iters / best
        results[name] = rps
        print(f"{name}: {best / iters * 1000:.1f} ms/iter  "
              f"{rps:,.0f} rays/s", flush=True)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
