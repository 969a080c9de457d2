"""bf16 vs int8 render-table A/B on the chip (render.table_dtype).

Times, in ONE process (axon-tunnel throughput varies between process
lifetimes), the proj-mode render_rays under both table dtypes at bench
shapes — dense-64 and guided-16+16 — using the same scan-mode measurement
as bench.py (iters distinct ray batches inside one jit; single fence).
This is the decision measurement for render.table_dtype's default: int8
halves the bytes of the HBM-bound fused-corner gather (BASELINE.md
roofline row 1) at a bounded per-channel quantization error
(tests/test_render_table.py::test_quantized_corner_table_matches_f32).
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    from nerfloc_tpu.configs import (Config, MatchingConfig, RenderConfig,
                                     compute_dtype_of)
    from nerfloc_tpu.data import device_batch, make_query_batch
    from nerfloc_tpu.geometry.cameras import rays_for_pixels
    from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator

    H, W, V = 240, 320, 5
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    R, iters = 4096, 20
    rngs = jax.random.split(rng, 2)
    uv_all = jnp.stack([
        jax.random.uniform(rngs[0], (iters, R), minval=0, maxval=W - 1),
        jax.random.uniform(rngs[1], (iters, R), minval=0, maxval=H - 1)], -1)
    ro_all, rd_all = jax.vmap(
        lambda uv: rays_for_pixels(uv, batch["K"], batch["pose"]))(uv_all)

    def bench_cfg(tag, n_samples, n_imp, table_dtype, n_guide=64,
                  params_cache={}):
        cfg = Config(backbone2d_fpn_dim=192, model_3d_hidden_dim=128,
                     matcher_hidden_dim=192,
                     render=RenderConfig(N_samples=n_samples,
                                         N_importance=n_imp,
                                         N_rand=1024, chunk=2048,
                                         table_dtype=table_dtype,
                                         N_guide=n_guide),
                     matching=MatchingConfig(fine_num_3d_keypoints=1024))
        model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
        key = (n_samples, n_imp)
        if key not in params_cache:
            small = dict(batch)
            s = 128
            small["image"] = batch["image"][:s, :s]
            small["depth"] = batch["depth"][:s, :s]
            small["topk_images"] = batch["topk_images"][:, :s, :s]
            small["topk_depths"] = batch["topk_depths"][:, :s, :s]
            params_cache[key] = jax.jit(model.init)(rng, small, rng)
        params = params_cache[key]
        ctx = jax.jit(lambda p, b: model.apply(
            p, b, method=model.build_context)[0])(params, batch)

        @jax.jit
        def render_scan(params, ctx, ro_all, rd_all, pose):
            def body(acc, rays):
                ro, rd = rays
                out = model.apply(params, method=lambda m: m.model_3d.
                                  render_rays(ctx, ro, rd, pose, False))
                return acc + jnp.sum(out["rgb"]) + jnp.sum(out["depth"]), ()
            return jax.lax.scan(body, jnp.float32(0.0), (ro_all, rd_all))[0]

        float(render_scan(params, ctx, ro_all, rd_all, batch["pose"]))  # warm
        t0 = time.perf_counter()
        float(render_scan(params, ctx, ro_all, rd_all, batch["pose"]))
        rps = R * iters / (time.perf_counter() - t0)
        print(f"{tag:28s}: {rps:10,.0f} rays/s")
        return rps

    if "--guide-sweep" in sys.argv:
        # guide-pass depth sweep at guided-16+16 (RenderConfig.N_guide;
        # the reference hardcodes 64) — throughput side of the trade,
        # PSNR side in tools/guided_sampling_check.py
        for ng in (64, 48, 32):
            bench_cfg(f"guided-16+16 guide={ng}", 16, 16, "bf16", ng)
        return
    for table_dtype in ("bf16", "int8"):
        bench_cfg(f"dense-64  {table_dtype}", 64, 0, table_dtype)
    for table_dtype in ("bf16", "int8"):
        bench_cfg(f"guided-16+16 {table_dtype}", 16, 16, table_dtype)


if __name__ == "__main__":
    main()
