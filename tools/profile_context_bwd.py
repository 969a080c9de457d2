"""Bisect the train-step hot segment: WHERE in build_context's backward
do the ~491 ms go? (BASELINE.md "Train-step budget": context fwd+bwd is
56% of the 873 ms step while its forward is <=35 ms.)

Each probe is its own jit computing value_and_grad of a scalarized
target wrt params, timed with the chained-accumulator single-fence
pattern (axon block_until_ready does not wait). Probes:

  ctx_fwd        build_context forward only (baseline floor)
  ctx_bwd        fwd+bwd of everything SceneContext + q2d reaches
  ctx_bwd_nobb   same but backbone features stop_gradient'ed before any
                 consumer -> delta vs ctx_bwd = backbone backward share
  bb_bwd         fwd+bwd of extract_2d on query+support alone
                 (cross-check for the ctx_bwd - ctx_bwd_nobb delta)
  dfn_bwd        fwd+bwd of DepthFusionNet alone (cost volumes over V)
  match_live     fwd+bwd of only what the MATCHING branch keeps live
                 (coarse/fine neural points + kp scores, no render
                 tables) -> the no_nerf liveness
  full_live      ctx_bwd again but scalarizing only the packed render
                 tables -> what rendering keeps live

The replica of build_context below mirrors
models/pose_estimator.py:133-159 (reference nerf_pose_estimator.py:
218-237) so stop_gradient can be injected between stages without
touching product code; if build_context changes, update the replica.

Usage (real TPU, default env; ~10 min of compiles):
  python tools/profile_context_bwd.py [iters]
Logic check on CPU (tiny shapes, timings meaningless):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  python tools/profile_context_bwd.py 1 --tiny
Results: BASELINE.md "Train-step budget" (bisection subsection).
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
from nerfloc_tpu.models.appearance import appearance_embedding
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator


def _scalarize(tree):
    tot = jnp.float32(0.0)
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            tot = tot + jnp.sum(x.astype(jnp.float32))
    return tot


def spin_up(ms: float = 2000.0):
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: jnp.sum(x @ x))
    t0 = time.perf_counter()
    while (time.perf_counter() - t0) * 1000 < ms:
        float(f(x))


def time_ms(fn, args, iters):
    acc = _scalarize(fn(*args))
    float(acc)  # compile + warm
    spin_up()
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + _scalarize(fn(*args))
    float(acc)
    return (time.perf_counter() - t0) / iters * 1000.0


def main(iters: int = 10, tiny: bool = False):
    if tiny:
        cfg = Config(
            backbone2d_fpn_dim=16, model_3d_hidden_dim=16,
            matcher_hidden_dim=24,
            render=RenderConfig(N_samples=4, N_rand=8, chunk=64),
            matching=MatchingConfig(fine_num_3d_keypoints=16,
                                    coarse_num_3d_keypoints=16),
        )
        H, W = 64, 96
    else:
        cfg = Config(
            backbone2d_fpn_dim=192,
            model_3d_hidden_dim=128,
            matcher_hidden_dim=192,
            render=RenderConfig(N_samples=64, N_rand=1024, chunk=2048,
                                use_render_uncertainty=True,
                                render_feature=True),
            matching=MatchingConfig(fine_num_3d_keypoints=1024,
                                    coarse_num_3d_keypoints=1024),
        )
        H, W = 240, 320
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    rng = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=5, H=H, W=W,
                                           seed=0)).items()}
    small = dict(batch)
    s = 128
    small["image"] = batch["image"][:s, :s]
    small["depth"] = batch["depth"][:s, :s]
    small["topk_images"] = batch["topk_images"][:, :s, :s]
    small["topk_depths"] = batch["topk_depths"][:, :s, :s]
    params = jax.jit(model.init)(rng, small, rng)

    strides = Backbone2D().layer_to_stride
    sc = strides[cfg.backbone2d_coarse_layer_name]
    sf = strides[cfg.backbone2d_fine_layer_name]

    def ctx_replica(m, batch, stop_backbone=False):
        # mirrors NerfPoseEstimator.build_context (pose_estimator.py:133):
        # one batched [1+V]-image backbone pass, then split
        a2d = m.extract_2d(jnp.concatenate(
            [batch["image"][None], batch["topk_images"]], axis=0))
        if stop_backbone:
            a2d = jax.tree.map(
                lambda x: jax.lax.stop_gradient(x)
                if hasattr(x, "dtype") else x, a2d)
        q2d = m._slice_2d(a2d, 0, 1)
        s2d = m._slice_2d(a2d, 1, None)
        feat_coarse_src = s2d["feat_coarse"]
        feat_fine_src = s2d["feat_fine"]
        topk_images = batch["topk_images"]
        embedding_a = None
        if m.cfg.encode_appearance:
            embedding_a = appearance_embedding(q2d["feat_pyramid"]["conv1"])
            embedding_src = appearance_embedding(s2d["feat_pyramid"]["conv1"])
            if m.cfg.train_nerf:
                topk_images = m.adapt_appearance_rgb(
                    topk_images, embedding_src, embedding_a)
            feat_coarse_src = m.adapt_appearance_coarse(
                feat_coarse_src, embedding_src, embedding_a)
            feat_fine_src = m.adapt_appearance_fine(
                feat_fine_src, embedding_src, embedding_a)
        ctx = m.model_3d.build_scene_context(
            topk_images, batch["topk_depths"], batch["topk_poses"],
            batch["topk_Ks"], batch["near"], batch["far"],
            feat_coarse_src, feat_fine_src, sc, sf, embedding_a)
        return ctx, q2d

    def make_probe(target_fn, grad=True):
        if grad:
            def loss(params, batch):
                return _scalarize(model.apply(
                    params, method=lambda m: target_fn(m, batch)))
            vg = jax.value_and_grad(loss)

            @jax.jit
            def probe(params, batch):
                v, g = vg(params, batch)
                return v + _scalarize(g)
        else:
            @jax.jit
            def probe(params, batch):
                return _scalarize(model.apply(
                    params, method=lambda m: target_fn(m, batch)))
        return probe

    def agg_probe(m, batch, grad_featmaps=True):
        """Isolate the multiview-aggregator's featmap-gradient path: sv and
        xyz are stop_gradient'ed; only the (adapted) featmaps carry
        gradient when grad_featmaps — the delta between the two settings
        is exactly the bilinear-sampling transpose (scatter-adds into
        [V,h,w,C]), since aggregator PARAM grads flow in both."""
        ctx, _ = ctx_replica(m, batch)
        sg = jax.lax.stop_gradient
        sv = jax.tree.map(lambda x: sg(x) if hasattr(x, "dtype") else x,
                          ctx.sv)
        xyz = sg(ctx.fine.xyz)
        feat = ctx.feat_fine_src if grad_featmaps \
            else sg(ctx.feat_fine_src)
        mv_feat, w, vis, dd = m.model_3d.multiview_aggregator(sv, feat, xyz)
        return mv_feat

    def only_tables(ctx):
        return [t for t in (ctx.fused_fine_packed, ctx.rgb_packed,
                            ctx.render_table, ctx.xyz_window_packed,
                            ctx.vis_corner_packed, ctx.feat_fine_packed)
                if t is not None]

    probes = {
        "ctx_fwd": make_probe(lambda m, b: ctx_replica(m, b), grad=False),
        "ctx_bwd": make_probe(lambda m, b: ctx_replica(m, b)),
        "ctx_bwd_nobb": make_probe(
            lambda m, b: ctx_replica(m, b, stop_backbone=True)),
        "bb_bwd": make_probe(
            lambda m, b: m.extract_2d(jnp.concatenate(
                [b["image"][None], b["topk_images"]], axis=0))),
        "dfn_bwd": make_probe(
            lambda m, b: m.model_3d.depth_fusion(
                b["topk_images"], b["topk_depths"], b["topk_Ks"],
                b["topk_poses"], b["near"], b["far"])),
        "match_live": make_probe(
            lambda m, b: (lambda cq: (cq[0].coarse, cq[0].fine, cq[1]))(
                ctx_replica(m, b))),
        "tables_live": make_probe(
            lambda m, b: only_tables(ctx_replica(m, b)[0])),
        "agg_featgrad": make_probe(
            lambda m, b: agg_probe(m, b, grad_featmaps=True)),
        "agg_nofeatgrad": make_probe(
            lambda m, b: agg_probe(m, b, grad_featmaps=False)),
    }

    report = {}
    for name, probe in probes.items():
        t = time_ms(probe, (params, batch), iters)
        report[name] = round(t, 1)
        print(f"{name:<14} {t:7.1f} ms", flush=True)

    d = report
    print("\nderived:")
    print(f"  backbone bwd share (ctx_bwd - ctx_bwd_nobb): "
          f"{d['ctx_bwd'] - d['ctx_bwd_nobb']:7.1f} ms "
          f"(cross-check bb_bwd alone: {d['bb_bwd']:.1f})")
    print(f"  dfn alone fwd+bwd                          : "
          f"{d['dfn_bwd']:7.1f} ms")
    print(f"  non-backbone ctx bwd (ctx_bwd_nobb - ctx_fwd): "
          f"{d['ctx_bwd_nobb'] - d['ctx_fwd']:7.1f} ms")
    print(f"  matching-liveness fwd+bwd                  : "
          f"{d['match_live']:7.1f} ms")
    print(f"  tables-liveness fwd+bwd                    : "
          f"{d['tables_live']:7.1f} ms")
    print(f"  aggregator featmap-grad (sampling transpose scatter): "
          f"{d['agg_featgrad'] - d['agg_nofeatgrad']:7.1f} ms "
          f"(featgrad {d['agg_featgrad']:.1f} vs nofeatgrad "
          f"{d['agg_nofeatgrad']:.1f})")
    print("\n" + json.dumps(report))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--tiny"]
    main(int(argv[0]) if argv else 10, tiny="--tiny" in sys.argv)
