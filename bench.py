"""Render-throughput benchmark (rays/sec/chip).

Measures the conditional-NeRF volume-render path — the hot loop of the
reference (conditional_nerf/model.py:472-600, chunked at 2048 rays with
N_samples=64; wall-clock printed at nerf_pose_estimator.py:377-381) — on one
chip, end to end under a single jit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is vs. BASELINE.md's reference estimate for the torch/GPU render
path (~20k rays/s at chunk=2048 x 64 samples on an A100-class GPU; the repo
publishes no number, so this anchor is the north-star's 10x target base).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_RAYS_PER_SEC = 20_000.0  # torch render-path anchor (BASELINE.md)


def spin_up(ms: float = 3000.0):
    """Burn ~ms of device time before timing: after the long compile phase
    the chip idles and the first ~2s of execution run well below steady-state
    throughput (measured ~40ms of inflation on the first two timing loops in
    a fresh process over the axon tunnel)."""
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: jnp.sum(x @ x))
    t0 = time.perf_counter()
    while (time.perf_counter() - t0) * 1000 < ms:
        float(f(x))


def main():
    from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig
    from nerfloc_tpu.data import device_batch, make_query_batch
    from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator

    cfg = Config(
        backbone2d_fpn_dim=192,
        model_3d_hidden_dim=128,
        matcher_hidden_dim=192,
        render=RenderConfig(N_samples=64, N_rand=1024, chunk=2048),
        matching=MatchingConfig(fine_num_3d_keypoints=1024),
    )
    from nerfloc_tpu.configs import compute_dtype_of
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))

    H, W, V = 240, 320, 5
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, _shrink_init_batch(batch), rng)

    n_rays = 4096

    # production shape: the scene context (backbone + neural points +
    # visibility featmaps) is built ONCE per localization query, then rays
    # are rendered in chunks against it (reference chunks at
    # conditional_nerf/model.py:616-635 but re-derives nothing per chunk).
    @jax.jit
    def build_ctx(params, batch):
        return model.apply(params, batch, method=model.build_context)[0]

    @jax.jit
    def render_chk(params, ctx, rays_o, rays_d, pose):
        def f(m):
            return m.model_3d.render_rays(ctx, rays_o, rays_d, pose, False)
        out = model.apply(params, method=f)
        return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

    rngs = jax.random.split(rng, 2)
    uv = jnp.stack([
        jax.random.uniform(rngs[0], (n_rays,), minval=0, maxval=W - 1),
        jax.random.uniform(rngs[1], (n_rays,), minval=0, maxval=H - 1),
    ], axis=-1)
    from nerfloc_tpu.geometry.cameras import rays_for_pixels
    rays_o, rays_d = rays_for_pixels(uv, batch["K"], batch["pose"])

    ctx = build_ctx(params, batch)
    float(render_chk(params, ctx, rays_o, rays_d, batch["pose"]))  # warm
    spin_up()

    # NOTE: the remote-TPU (axon) transport's block_until_ready does not
    # actually wait, and ONE scalar fetch costs a ~27ms RPC round trip. So:
    # chain the iterations through an on-device accumulator (strict ordering
    # via the data dependency) and fence ONCE at the end — the round trip
    # amortizes to ~1ms/iter instead of polluting every sample.
    #
    # Steady-state device throughput (the headline): `iters` DIFFERENT ray
    # batches rendered by one lax.scan inside a single jit call, so per-call
    # host dispatch (~10ms of pytree serialization over the axon transport,
    # which a pipelined production server overlaps) is excluded; distinct
    # rays per step keep XLA from CSE-ing the renders. The per-call
    # dispatched rate is also reported (value_dispatched).
    iters = 20
    uv_all = jnp.stack([
        jax.random.uniform(rngs[0], (iters, n_rays), minval=0, maxval=W - 1),
        jax.random.uniform(rngs[1], (iters, n_rays), minval=0, maxval=H - 1),
    ], axis=-1)
    ro_all, rd_all = jax.vmap(
        lambda uv: rays_for_pixels(uv, batch["K"], batch["pose"]))(uv_all)

    @jax.jit
    def render_scan(params, ctx, ro_all, rd_all, pose):
        def body(acc, rays):
            ro, rd = rays

            def f(m):
                return m.model_3d.render_rays(ctx, ro, rd, pose, False)
            out = model.apply(params, method=f)
            return acc + jnp.sum(out["rgb"]) + jnp.sum(out["depth"]), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (ro_all, rd_all))
        return acc

    float(render_scan(params, ctx, ro_all, rd_all, batch["pose"]))  # warm
    spin_up(1000.0)
    t0 = time.perf_counter()
    float(render_scan(params, ctx, ro_all, rd_all, batch["pose"]))
    dt = time.perf_counter() - t0
    rays_per_sec = n_rays * iters / dt

    # Headline measured — everything below is optional detail. Each extra
    # runs guarded so a failure 20 minutes of compiles in cannot invalidate
    # the whole artifact (BENCH_r04 post-mortem: an UnexpectedTracerError in
    # the LAST extra zeroed the round's only perf number).
    result = {
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
    }
    errors = {}

    def extra(name, fn):
        try:
            result.update(fn())
        except Exception as e:  # noqa: BLE001 — record, keep benching
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    def bench_dispatched():
        acc = render_chk(params, ctx, rays_o, rays_d, batch["pose"])
        float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + render_chk(params, ctx, rays_o, rays_d,
                                   batch["pose"])
        float(acc)  # single fence drains the whole dispatch queue
        dt = time.perf_counter() - t0
        return {"value_dispatched": round(n_rays * iters / dt, 1)}

    # end-to-end localization (features -> 3D desc -> match -> on-device
    # PnP), the reference's full test-time query (nerf_pose_estimator.py:
    # 239-583 with pycolmap PnP on CPU; here one XLA program)
    @jax.jit
    def localize(params, batch, rng):
        out = model.apply(params, batch, rng, method=model.localize_forward)
        return out["pose"]

    loc_iters = 10

    def time_localize(b):
        float(jnp.sum(localize(params, b, rng)))  # warm/compile
        spin_up(1000.0)
        pacc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(loc_iters):
            pacc = pacc + jnp.sum(localize(params, b, rng))
        float(pacc)
        return (time.perf_counter() - t0) / loc_iters * 1000.0

    def bench_localize_v5():
        return {"localize_ms_per_query": round(time_localize(batch), 1)}

    # --- V=10 support views: the reference's test-time query shape
    # (n_views_test=10, reference configs/__init__.py:29-30)
    def bench_v10():
        batch10 = {k: jnp.asarray(v) for k, v in
                   device_batch(make_query_batch(n_views=10, H=H, W=W,
                                                 seed=1)).items()}
        ctx10 = build_ctx(params, batch10)
        float(render_scan(params, ctx10, ro_all, rd_all, batch10["pose"]))
        spin_up(1000.0)
        t0 = time.perf_counter()
        float(render_scan(params, ctx10, ro_all, rd_all, batch10["pose"]))
        v10 = n_rays * iters / (time.perf_counter() - t0)
        return {"render_rays_per_sec_v10": round(v10, 1),
                "localize_ms_per_query_v10": round(time_localize(batch10), 1)}

    # --- NeuRay-guided 16+16 sampling (the reference's own N_importance
    # mechanism, model.py:487-496): equal-or-better PSNR than dense-64 at
    # half the per-ray sample budget (BASELINE.md "Guided / reduced
    # sampling"). Separate params: RayUnet norm shapes depend on the
    # total sample count. Last: it compiles a second full model.
    def bench_guided():
        import dataclasses as _dc

        cfg_g = _dc.replace(cfg, render=_dc.replace(cfg.render, N_samples=16,
                                                    N_importance=16))
        model_g = NerfPoseEstimator(cfg_g, dtype=compute_dtype_of(cfg_g))
        params_g = jax.jit(model_g.init)(rng, _shrink_init_batch(batch), rng)

        @jax.jit
        def build_ctx_g(params, batch):
            return model_g.apply(params, batch,
                                 method=model_g.build_context)[0]

        @jax.jit
        def render_scan_g(params, ctx, ro_all, rd_all, pose):
            def body(acc, rays):
                ro, rd = rays

                def f(m):
                    return m.model_3d.render_rays(ctx, ro, rd, pose, False)
                out = model_g.apply(params, method=f)
                return acc + jnp.sum(out["rgb"]) + jnp.sum(out["depth"]), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (ro_all, rd_all))
            return acc

        ctx_g = build_ctx_g(params_g, batch)
        float(render_scan_g(params_g, ctx_g, ro_all, rd_all, batch["pose"]))
        spin_up(1000.0)
        t0 = time.perf_counter()
        float(render_scan_g(params_g, ctx_g, ro_all, rd_all, batch["pose"]))
        g = n_rays * iters / (time.perf_counter() - t0)
        return {"value_guided_16_16": round(g, 1),
                "vs_baseline_guided": round(g / REFERENCE_RAYS_PER_SEC, 3)}

    extra("dispatched", bench_dispatched)
    extra("localize_v5", bench_localize_v5)
    extra("v10", bench_v10)
    extra("guided_16_16", bench_guided)
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


def _shrink_init_batch(batch):
    """init on a spatially smaller batch: param shapes are resolution-
    independent (convs + MLPs), so initialize cheaply."""
    import jax.numpy as jnp

    small = {}
    for k, v in batch.items():
        small[k] = v
    # keep >= 1024 coarse neural points (5 views x (128/8)^2 = 1280) so the
    # keypoint top-k in the init trace stays valid
    s = 128
    small["image"] = batch["image"][:s, :s]
    small["depth"] = batch["depth"][:s, :s]
    small["topk_images"] = batch["topk_images"][:, :s, :s]
    small["topk_depths"] = batch["topk_depths"][:, :s, :s]
    return small


if __name__ == "__main__":
    main()
