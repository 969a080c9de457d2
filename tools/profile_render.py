"""Stage-level timing of the render hot path on the real TPU.

Breaks the bench.py render call (R=4096 rays x 64 samples, V=5 support views,
fine cloud ~24k points) into its stages, each under its own jit, timed with
the chained-accumulator fencing pattern (see bench.py NOTE). Stage splits are
not perfectly additive (fusion across boundaries is lost) but give the budget.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    acc = fn(*args)
    jnp.asarray(acc).block_until_ready()
    float(jnp.sum(acc))
    t0 = time.perf_counter()
    a = acc
    for _ in range(iters):
        a = a + fn(*args)
    float(jnp.sum(a))
    return (time.perf_counter() - t0) / iters * 1000.0


def spin_up(ms: float = 3000.0):
    """Burn ~ms of real device time before measuring: the first ~2 timing
    loops in a fresh process read ~40ms high regardless of content
    (clock/transport ramp on the axon-tunneled chip)."""
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: jnp.sum(x @ x))
    t0 = time.perf_counter()
    while (time.perf_counter() - t0) * 1000 < ms:
        float(f(x))


def main():
    from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig, compute_dtype_of
    from nerfloc_tpu.data import device_batch, make_query_batch
    from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator

    fused = "--fused" in sys.argv
    separate = "--separate" in sys.argv  # pre-merged-table gather layout
    cfg = Config(
        backbone2d_fpn_dim=192,
        model_3d_hidden_dim=128,
        matcher_hidden_dim=192,
        render=RenderConfig(N_samples=64, N_rand=1024, chunk=2048,
                            fused_query_agg=fused,
                            use_merged_table=not separate),
        matching=MatchingConfig(fine_num_3d_keypoints=1024),
    )
    print(f"fused_query_agg={fused} use_merged_table={not separate}")
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    H, W, V = 240, 320, 5
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    small = dict(batch)
    s = 128
    small["image"] = batch["image"][:s, :s]
    small["depth"] = batch["depth"][:s, :s]
    small["topk_images"] = batch["topk_images"][:, :s, :s]
    small["topk_depths"] = batch["topk_depths"][:, :s, :s]
    params = jax.jit(model.init)(rng, small, rng)

    n_rays = 4096

    @jax.jit
    def build_ctx(params, batch):
        return model.apply(params, batch, method=model.build_context)[0]

    from nerfloc_tpu.geometry.cameras import rays_for_pixels
    rngs = jax.random.split(rng, 2)
    uv = jnp.stack([
        jax.random.uniform(rngs[0], (n_rays,), minval=0, maxval=W - 1),
        jax.random.uniform(rngs[1], (n_rays,), minval=0, maxval=H - 1),
    ], axis=-1)
    rays_o, rays_d = rays_for_pixels(uv, batch["K"], batch["pose"])
    ctx = build_ctx(params, batch)
    jax.block_until_ready(ctx)

    S = cfg.render.N_samples
    R = n_rays
    near, far = ctx.sv.near, ctx.sv.far

    from nerfloc_tpu.models.fields.projector import compute_projections
    from nerfloc_tpu.ops.knn import knn_rays

    t = jnp.linspace(0.0, 1.0, S, dtype=rays_o.dtype)
    z_vals = jnp.broadcast_to(near * (1.0 - t) + far * t, (R, S))
    xyz_flat = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
                ).reshape(-1, 3)
    dir_flat = jnp.concatenate([
        jnp.broadcast_to(rays_d[:, None, :], (R, S, 3)).reshape(-1, 3),
        z_vals.reshape(-1, 1)], axis=-1)

    @jax.jit
    def f_knn(rays_o, rays_d, z_vals, ctx):
        idx = knn_rays(rays_o, rays_d, z_vals, ctx.fine.xyz, K=8,
                       points_mask=ctx.fine.mask,
                       n_candidates=cfg.render.knn_candidates)
        return jnp.sum(idx)

    from nerfloc_tpu.ops.interp import sample_render_table
    from nerfloc_tpu.ops.knn import knn_from_candidate_planes, knn_proj

    @jax.jit
    def f_knn_proj(ctx, xyz_flat):
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, H, W)
        hf, wf = ctx.feat_fine_src.shape[1:3]
        if ctx.render_table is not None:
            # merged path: ONE gather yields fused features + candidates;
            # this stage therefore subsumes the agg's fused sampling too
            Cf = ctx.feat_fine_src.shape[-1] + ctx.sv.vis_featmaps.shape[-1]
            fs, cx, cy, cz, cval, cidx = sample_render_table(
                ctx.render_table, Cf, H, W, hf, wf, proj.uv)
            idx = knn_from_candidate_planes(
                xyz_flat, cx, cy, cz,
                cval & proj.in_front[:, :, None], cidx, 8)
            return jnp.sum(idx) + jnp.sum(fs)
        idx = knn_proj(xyz_flat, proj.uv / float(H // hf), proj.in_front,
                       ctx.xyz_window_packed, hf, wf, K=8)
        return jnp.sum(idx)

    @jax.jit
    def f_agg(params, ctx, xyz_flat):
        Hs, Ws = ctx.sv.images.shape[1:3]
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, Hs, Ws)

        def f(m):
            return m.model_3d.multiview_aggregator(
                ctx.sv, ctx.feat_fine_src, xyz_flat, proj=proj,
                fused_packed=ctx.fused_fine_packed,
                rgb_packed=ctx.rgb_packed,
                render_table=ctx.render_table)
        out, rgb_feat, vis, _ = model.apply(params, method=f)
        return jnp.sum(out) + jnp.sum(rgb_feat) + jnp.sum(vis)

    knn_idx_c = jax.jit(lambda: knn_rays(
        rays_o, rays_d, z_vals, ctx.fine.xyz, K=8, points_mask=ctx.fine.mask,
        n_candidates=cfg.render.knn_candidates).reshape(R * S, 8))()
    jax.block_until_ready(knn_idx_c)

    @jax.jit
    def f_query(params, ctx, xyz_flat, dir_flat, knn_idx):
        Hs, Ws = ctx.sv.images.shape[1:3]
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, Hs, Ws)

        def f(m):
            return m.model_3d.query(ctx, xyz_flat, level="fine", K=8,
                                    direction=dir_flat, knn_idx=knn_idx,
                                    proj=proj)
        qd = model.apply(params, method=f)
        return jnp.sum(qd["feature_agg"]) + jnp.sum(qd["multiview_feature"])

    @jax.jit
    def f_render(params, ctx, rays_o, rays_d, pose):
        def f(m):
            return m.model_3d.render_rays(ctx, rays_o, rays_d, pose, False)
        out = model.apply(params, method=f)
        return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

    # --- query() internals -------------------------------------------
    import flax.linen as fnn

    Wd = cfg.model_3d_hidden_dim

    @jax.jit
    def f_geo_gather(ctx, knn_idx):
        pts = ctx.fine
        geo = jnp.concatenate([pts.xyz, pts.direction,
                               pts.confidence.astype(pts.xyz.dtype),
                               pts.mask[:, None].astype(pts.xyz.dtype),
                               pts.feature.astype(pts.xyz.dtype)], axis=-1)
        return jnp.sum(jnp.take(geo, jnp.maximum(knn_idx, 0), axis=0))

    @jax.jit
    def f_embed(params, ctx, xyz_flat, dir_flat, knn_idx):
        pts = ctx.fine
        nb_xyz = jnp.take(pts.xyz, jnp.maximum(knn_idx, 0), axis=0)
        nb_dir = jnp.take(pts.direction, jnp.maximum(knn_idx, 0), axis=0)
        from nerfloc_tpu.geometry.math import safe_normalize

        def f(m):
            mod = m.model_3d
            scale = ctx.sv.far - ctx.sv.near
            off = xyz_flat[:, None, :] - nb_xyz
            rd = safe_normalize(dir_flat[:, None, :3] - nb_dir[..., :3])
            rdot = jnp.sum(dir_flat[:, None, :3] * nb_dir[..., :3], axis=-1,
                           keepdims=True)
            rdiff = jnp.concatenate([rd, rdot], axis=-1)
            return (mod.xyz_embed(off / scale).astype(mod.dtype),
                    mod.ray_diff_fc(rdiff.astype(mod.dtype)))
        a, b = model.apply(params, method=f)
        return jnp.sum(a) + jnp.sum(b)

    @jax.jit
    def f_mlp_attn(params, x_in, mv_agg):
        def f(m):
            mod = m.model_3d
            pf = mod.base_mlp(x_in)
            f1, _ = mod.base_mlp_attn(mv_agg[:, None, :], pf, pf)
            return f1
        return jnp.sum(model.apply(params, method=f))

    N_flat = R * S
    in_dim = (3 + cfg.backbone2d_fpn_dim) + 63 + 27  # feat + xyz_emb + rdfc
    x_in = jnp.zeros((N_flat, 8, in_dim), dtype=compute_dtype_of(cfg))
    mv_agg_fake = jnp.zeros((N_flat, Wd), dtype=compute_dtype_of(cfg))

    @jax.jit
    def f_tail(params, ctx, feature_agg):
        def f(m):
            geo = m.model_3d.ray_unet(feature_agg.reshape(R, S, -1))
            return m.model_3d.sigma_mlp(geo.reshape(R * S, -1))
        return jnp.sum(model.apply(params, method=f))

    feature_agg = jnp.zeros((R * S, cfg.model_3d_hidden_dim),
                            dtype=compute_dtype_of(cfg))

    print(f"fine cloud: {ctx.fine.xyz.shape[0]} pts, R={R}, S={S}, V={V}")
    stages = [
        ("knn_rays", f_knn, (rays_o, rays_d, z_vals, ctx)),
        ("knn_proj (default)", f_knn_proj, (ctx, xyz_flat)),
        ("proj+aggregate", f_agg, (params, ctx, xyz_flat)),
        ("query(full, knn given)", f_query,
         (params, ctx, xyz_flat, dir_flat, knn_idx_c)),
        ("rayunet+sigma", f_tail, (params, ctx, feature_agg)),
        ("geo gather [N,8]", f_geo_gather, (ctx, knn_idx_c)),
        ("embed+ray_diff", f_embed,
         (params, ctx, xyz_flat, dir_flat, knn_idx_c)),
        ("base_mlp+attn", f_mlp_attn, (params, x_in, mv_agg_fake)),
        ("render_rays(total)", f_render,
         (params, ctx, rays_o, rays_d, batch["pose"])),
    ]
    spin_up()
    for rep in range(2):  # report the 2nd pass; 1st also compiles everything
        for name, fn, args in stages:
            ms = timeit(fn, *args)
            if rep:
                print(f"{name:28s} {ms:8.2f} ms   "
                      f"({n_rays / ms * 1000:,.0f} rays/s)")


if __name__ == "__main__":
    main()
