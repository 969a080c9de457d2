"""Localization-query stage budget (VERDICT r4 "next" item 4).

Pose error — not rays/s — is the product metric, and the per-query floor
is localize_ms_per_query (bench.py: 43 ms V=5 / 99 ms V=10 across rounds
2-4 with no attribution). This decomposes the full on-device localization
query (reference nerf_pose_estimator.py:239-583: estimate + estimate_pose,
where the reference pays a CPU round-trip for pycolmap) into fenced
stages, each its own jit:

  backbone   extract_2d on the query + V support images (COTR ResNet+FPN)
  context    build_context TOTAL (backbone + appearance adaptation +
             DepthFusionNet + neural-point confidence); context-minus-
             backbone is the conditional-NeRF context share
  keypoints  _keypoints: Gumbel top-k + ConditionalNeRF.query_coarse
             (KNN + aggregation at 1024 points)
  match      coarse SelfCross transformer + S2D matcher + fine stage
             (query_fine + window gather + fine transformer)
  pnp        on-device P3P/DLT RANSAC + IRLS local-opt (512 hypotheses)
  full       localize_forward end-to-end (cross-check: stages should sum
             to ~full minus one dispatch)

Stage timing uses the bench.py fencing pattern: chain iterations through
an on-device accumulator, fence ONCE (axon's block_until_ready does not
wait; a scalar fetch costs ~27 ms RPC).

Usage (real TPU, default env; ~15 min of compiles):
  python tools/profile_localize.py [iters]
Results: BASELINE.md "Localization-query budget".
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nerfloc_tpu.configs import (Config, MatchingConfig, RenderConfig,
                                 compute_dtype_of)
from nerfloc_tpu.data import device_batch, make_query_batch
from nerfloc_tpu.models.backbone import Backbone2D
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.solve.pnp import ransac_pnp


def _scalarize(tree):
    tot = jnp.float32(0.0)
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def spin_up(ms: float = 1000.0):
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: jnp.sum(x @ x))
    t0 = time.perf_counter()
    while (time.perf_counter() - t0) * 1000 < ms:
        float(f(x))


def time_ms(fn, args, iters):
    """Warm once, then `iters` chained calls, one fence at the end."""
    acc = _scalarize(fn(*args))
    float(acc)  # compile + warm
    spin_up()
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + _scalarize(fn(*args))
    float(acc)
    return (time.perf_counter() - t0) / iters * 1000.0


def main(iters: int = 10, fullvar: bool = False):
    cfg = Config(
        backbone2d_fpn_dim=192,
        model_3d_hidden_dim=128,
        matcher_hidden_dim=192,
        render=RenderConfig(N_samples=64, N_rand=1024, chunk=2048),
        matching=MatchingConfig(fine_num_3d_keypoints=1024,
                                coarse_num_3d_keypoints=1024),
    )
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    H, W = 240, 320
    rng = jax.random.PRNGKey(0)

    batch5 = {k: jnp.asarray(v) for k, v in
              device_batch(make_query_batch(n_views=5, H=H, W=W,
                                            seed=0)).items()}
    small = dict(batch5)
    s = 128
    small["image"] = batch5["image"][:s, :s]
    small["depth"] = batch5["depth"][:s, :s]
    small["topk_images"] = batch5["topk_images"][:, :s, :s]
    small["topk_depths"] = batch5["topk_depths"][:, :s, :s]
    params = jax.jit(model.init)(rng, small, rng)

    @jax.jit
    def backbone(params, batch):
        def f(m):
            # one batched [1+V] pass, mirroring build_context
            return m.extract_2d(jnp.concatenate(
                [batch["image"][None], batch["topk_images"]], axis=0))
        return model.apply(params, method=f)

    @jax.jit
    def context(params, batch):
        return model.apply(params, batch, method=model.build_context)

    @jax.jit
    def keypoints(params, ctx, batch, rng):
        def f(m):
            return m._keypoints(ctx, batch, rng)
        return model.apply(params, method=f)

    # strides are static python ints inside the model; crossing the jit
    # boundary as dict values would turn them into tracers and break the
    # static reshape in match — re-pin them from the config-known backbone
    # strides via closure instead
    strides = Backbone2D().layer_to_stride
    sc = strides[cfg.backbone2d_coarse_layer_name]
    sf = strides[cfg.backbone2d_fine_layer_name]

    @jax.jit
    def match(params, ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc):
        q2d = dict(q2d, stride_coarse=sc, stride_fine=sf)

        def f(m):
            return m.match(ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc, False)
        return model.apply(params, method=f)

    @jax.jit
    def pnp(m, K, rng):
        out = ransac_pnp(m["mkps2d_f"], m["mkps3d"], m["pair_mask"], K, rng,
                         thresh_px=cfg.ransac_thresh,
                         n_hyps=cfg.shapes.pnp_hypotheses)
        return out.c2w, out.num_inliers

    @jax.jit
    def full(params, batch, rng):
        out = model.apply(params, batch, rng, method=model.localize_forward)
        return out["pose"]

    if fullvar:
        # Config-delta attribution on the FUSED query: the per-stage jits
        # above carry ~10-25 ms of per-dispatch axon-tunnel overhead each
        # (session-varying), so deltas of `full` under one changed knob
        # are the only attribution immune to it. Params are shared: none
        # of these knobs change the parameter tree.
        import dataclasses as _dc
        variants = {
            "base(kp1024,hyp512)": cfg,
            "hyp64": _dc.replace(
                cfg, shapes=_dc.replace(cfg.shapes, pnp_hypotheses=64)),
            "kp256": _dc.replace(
                cfg, matching=_dc.replace(
                    cfg.matching, fine_num_3d_keypoints=256,
                    coarse_num_3d_keypoints=256)),
        }
        print(f"\n=== full-localize config deltas (V=5, {iters} iters) ===")
        rep = {}
        for name, vcfg in variants.items():
            vmodel = NerfPoseEstimator(vcfg, dtype=compute_dtype_of(vcfg))

            @jax.jit
            def vfull(params, batch, rng, _m=vmodel):
                out = _m.apply(params, batch, rng,
                               method=_m.localize_forward)
                return out["pose"]

            t = time_ms(vfull, (params, batch5, rng), iters)
            rep[name] = round(t, 1)
            print(f"  {name:<22} {t:7.1f} ms", flush=True)
        print(json.dumps(rep))
        return

    report = {}
    for V, seed in ((5, 0), (10, 1)):
        batch = batch5 if V == 5 else {
            k: jnp.asarray(v) for k, v in
            device_batch(make_query_batch(n_views=V, H=H, W=W,
                                          seed=seed)).items()}
        ctx, q2d = context(params, batch)
        desc_3d, pts3d, pts3d_ndc = keypoints(params, ctx, batch, rng)
        m = match(params, ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc)

        t = {}
        t["backbone"] = time_ms(backbone, (params, batch), iters)
        t["context_total"] = time_ms(context, (params, batch), iters)
        t["keypoints"] = time_ms(keypoints, (params, ctx, batch, rng), iters)
        t["match"] = time_ms(
            match, (params, ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc),
            iters)
        t["pnp"] = time_ms(pnp, (m, batch["K"], rng), iters)
        t["full"] = time_ms(full, (params, batch, rng), iters)
        t["context_minus_backbone"] = t["context_total"] - t["backbone"]
        stages = t["context_total"] + t["keypoints"] + t["match"] + t["pnp"]
        t["stage_sum"] = stages
        report[f"V{V}"] = {k: round(v, 1) for k, v in t.items()}
        print(f"\n=== V={V} (H={H} W={W}, 1024 kps, "
              f"{cfg.shapes.pnp_hypotheses} hyps, {iters} iters) ===")
        for k in ("backbone", "context_total", "context_minus_backbone",
                  "keypoints", "match", "pnp", "stage_sum", "full"):
            print(f"  {k:<24} {t[k]:7.1f} ms")
    print("\n" + json.dumps(report))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--fullvar"]
    main(int(argv[0]) if argv else 10, fullvar="--fullvar" in sys.argv)
