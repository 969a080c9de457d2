"""Merged vs separate render-table A/B on the chip: gather+KNN segment only.

Times, in ONE process (axon-tunnel throughput varies between process
lifetimes), the proj-mode render's table segment under both layouts:
  separate: packed 4-corner fused gather + knn_proj 3x3 window gather
  merged:   one pack_render_table row gather (fused + 5x5 window planes)
plus the downstream exact re-rank sort each implies (V*9 vs V*25 lanes),
and the end-to-end render_rays under both SceneContexts. This is the
decision measurement for render.use_merged_table's default.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    import dataclasses

    from nerfloc_tpu.configs import (Config, MatchingConfig, RenderConfig,
                                     compute_dtype_of)
    from nerfloc_tpu.data import device_batch, make_query_batch
    from nerfloc_tpu.geometry.cameras import rays_for_pixels
    from nerfloc_tpu.models.fields.projector import compute_projections
    from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
    from nerfloc_tpu.ops.interp import (packed_bilinear_sample_views,
                                        sample_render_table)
    from nerfloc_tpu.ops.knn import knn_from_candidate_planes, knn_proj

    base = Config(backbone2d_fpn_dim=192, model_3d_hidden_dim=128,
                  matcher_hidden_dim=192,
                  render=RenderConfig(N_samples=64, N_rand=1024, chunk=2048),
                  matching=MatchingConfig(fine_num_3d_keypoints=1024))
    H, W, V = 240, 320, 5
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0)).items()}
    rng = jax.random.PRNGKey(0)

    R, S = 4096, 64
    rngs = jax.random.split(rng, 2)
    uv = jnp.stack([
        jax.random.uniform(rngs[0], (R,), minval=0, maxval=W - 1),
        jax.random.uniform(rngs[1], (R,), minval=0, maxval=H - 1)], -1)
    rays_o, rays_d = rays_for_pixels(uv, batch["K"], batch["pose"])

    params = None
    ctxs = {}
    models = {}
    for name, merged in (("merged", True), ("separate", False)):
        cfg = dataclasses.replace(
            base, render=dataclasses.replace(base.render,
                                             use_merged_table=merged))
        model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
        if params is None:
            small = dict(batch)
            s = 128
            small["image"] = batch["image"][:s, :s]
            small["depth"] = batch["depth"][:s, :s]
            small["topk_images"] = batch["topk_images"][:, :s, :s]
            small["topk_depths"] = batch["topk_depths"][:, :s, :s]
            params = jax.jit(model.init)(rng, small, rng)
        ctx = jax.jit(lambda p, b, m=model: m.apply(
            p, b, method=m.build_context)[0])(params, batch)
        jax.block_until_ready(ctx)
        ctxs[name] = ctx
        models[name] = (model, cfg)

    ctx_m, ctx_s = ctxs["merged"], ctxs["separate"]
    near, far = ctx_m.sv.near, ctx_m.sv.far
    t = jnp.linspace(0.0, 1.0, S, dtype=rays_o.dtype)
    z_vals = jnp.broadcast_to(near * (1.0 - t) + far * t, (R, S))
    xyz_flat = (rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
                ).reshape(-1, 3)
    hf, wf = ctx_m.feat_fine_src.shape[1:3]
    Cf = ctx_m.feat_fine_src.shape[-1] + ctx_m.sv.vis_featmaps.shape[-1]
    stride = H // hf

    @jax.jit
    def seg_merged(ctx, xyz_flat):
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, H, W)
        fs, cx, cy, cz, cval, cidx = sample_render_table(
            ctx.render_table, Cf, H, W, hf, wf, proj.uv)
        idx = knn_from_candidate_planes(
            xyz_flat, cx, cy, cz, cval & proj.in_front[:, :, None], cidx, 8)
        rgb = packed_bilinear_sample_views(ctx.rgb_packed, H, W, proj.uv)
        return jnp.sum(idx) + jnp.sum(fs) + jnp.sum(rgb)

    @jax.jit
    def seg_separate(ctx, xyz_flat):
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, H, W)
        idx = knn_proj(xyz_flat, proj.uv / float(stride), proj.in_front,
                       ctx.xyz_window_packed, hf, wf, K=8, win=3)
        scale = jnp.array([(wf - 1.0) / (W - 1.0), (hf - 1.0) / (H - 1.0)],
                          dtype=proj.uv.dtype)
        fs = packed_bilinear_sample_views(ctx.fused_fine_packed, hf, wf,
                                          proj.uv * scale)
        rgb = packed_bilinear_sample_views(ctx.rgb_packed, H, W, proj.uv)
        return jnp.sum(idx) + jnp.sum(fs) + jnp.sum(rgb)

    @jax.jit
    def seg_merged_nosort(ctx, xyz_flat):
        """Gather + candidate-plane distances, re-rank replaced by a lane
        min — isolates how much of the merged segment is the V*25 sort."""
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, H, W)
        fs, cx, cy, cz, cval, cidx = sample_render_table(
            ctx.render_table, Cf, H, W, hf, wf, proj.uv)
        d2 = ((xyz_flat[None, :, None, 0] - cx) ** 2
              + (xyz_flat[None, :, None, 1] - cy) ** 2
              + (xyz_flat[None, :, None, 2] - cz) ** 2)
        rgb = packed_bilinear_sample_views(ctx.rgb_packed, H, W, proj.uv)
        return jnp.sum(jnp.min(d2, axis=-1)) + jnp.sum(fs) + jnp.sum(rgb)

    @jax.jit
    def seg_merged_approx(ctx, xyz_flat):
        """Re-rank via approx_min_k over the V*25 lanes instead of the full
        key-value sort (selection only needs the top-8 set)."""
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, H, W)
        fs, cx, cy, cz, cval, cidx = sample_render_table(
            ctx.render_table, Cf, H, W, hf, wf, proj.uv)
        valid = cval & proj.in_front[:, :, None]
        d2 = ((xyz_flat[None, :, None, 0] - cx) ** 2
              + (xyz_flat[None, :, None, 1] - cy) ** 2
              + (xyz_flat[None, :, None, 2] - cz) ** 2)
        BIG = jnp.finfo(jnp.float32).max / 4
        d2 = jnp.where(valid, d2, BIG)
        N = d2.shape[1]
        d2f = jnp.moveaxis(d2, 0, 1).reshape(N, -1)
        idxf = jnp.moveaxis(cidx, 0, 1).reshape(N, -1)
        _, pos = jax.lax.approx_min_k(d2f, k=8)
        idx = jnp.take_along_axis(idxf, pos, axis=1)
        rgb = packed_bilinear_sample_views(ctx.rgb_packed, H, W, proj.uv)
        return jnp.sum(idx) + jnp.sum(fs) + jnp.sum(rgb)

    print(f"gather+knn merged       : {timeit(seg_merged, ctx_m, xyz_flat):8.2f} ms")
    print(f"gather+knn merged nosort: {timeit(seg_merged_nosort, ctx_m, xyz_flat):8.2f} ms")
    print(f"gather+knn merged approx: {timeit(seg_merged_approx, ctx_m, xyz_flat):8.2f} ms")
    print(f"gather+knn separate     : {timeit(seg_separate, ctx_s, xyz_flat):8.2f} ms")

    for name in ("merged", "separate"):
        model, cfg = models[name]
        f = jax.jit(lambda p, ctx, ro, rd, pose, m=model: jnp.sum(m.apply(
            p, method=lambda mm: mm.model_3d.render_rays(
                ctx, ro, rd, pose, False))["rgb"]))
        ms = timeit(f, params, ctxs[name], rays_o, rays_d, batch["pose"],
                    reps=4)
        print(f"render_rays {name:9s}: {ms:8.2f} ms ({R / ms * 1000:,.0f} rays/s)")


if __name__ == "__main__":
    main()
