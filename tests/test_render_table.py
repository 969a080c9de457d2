"""Merged render-gather table (ops/interp.pack_render_table).

One [V*N]-row gather replaces the proj-mode render's two featmap-resolution
gathers (bilinear fused features, knn_proj candidate window); full-res rgb
keeps its own 12-column table (see pack_render_table for why). Pins:
  1. bilinear fused/rgb parity vs the separate packed-corner tables;
  2. the 5x5 [-1..+3] candidate window is a strict superset of
     knn_proj(win=3)'s round-anchored 3x3 at every pixel (the anchor-drift
     proof in ops/interp.RENDER_WINDOW);
  3. the full localization query path is numerically unchanged when the
     SceneContext switches between merged and separate tables.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig, compute_dtype_of
from nerfloc_tpu.data import device_batch, make_query_batch
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.ops.interp import (RENDER_WINDOW, pack_bilinear_corners,
                                    pack_render_table,
                                    packed_bilinear_sample_views,
                                    sample_render_table)
from nerfloc_tpu.ops.knn import xyz_window_channels


def _random_inputs(seed, V=3, hf=12, wf=17, Cf=8, stride=4):
    rng = np.random.default_rng(seed)
    Hs, Ws = hf * stride, wf * stride
    fused = rng.normal(size=(V, hf, wf, Cf)).astype(np.float32)
    images = rng.uniform(size=(V, Hs, Ws, 3)).astype(np.float32)
    xyz = rng.normal(size=(V, hf, wf, 3)).astype(np.float32) * 3.0
    mask = rng.uniform(size=(V, hf, wf)) > 0.2
    # uv spans in-bounds, borders, and out-of-bounds territory
    N = 500
    uv = np.stack([rng.uniform(-6, Ws + 5, (V, N)),
                   rng.uniform(-6, Hs + 5, (V, N))], -1).astype(np.float32)
    return fused, images, xyz, mask, uv, Hs, Ws


def test_fused_parity_with_separate_tables():
    fused, images, xyz, mask, uv, Hs, Ws = _random_inputs(0)
    V, hf, wf, Cf = fused.shape
    xyz10 = xyz_window_channels(jnp.asarray(xyz), jnp.asarray(mask))
    table = pack_render_table(jnp.asarray(fused), xyz10)
    f_m = sample_render_table(table, Cf, Hs, Ws, hf, wf, jnp.asarray(uv))[0]

    scale = np.array([(wf - 1) / (Ws - 1), (hf - 1) / (Hs - 1)], np.float32)
    f_ref = packed_bilinear_sample_views(
        pack_bilinear_corners(jnp.asarray(fused)), hf, wf,
        jnp.asarray(np.clip(uv, 0, [Ws - 1, Hs - 1]) * scale))

    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_ref),
                               atol=2e-5, rtol=1e-5)


def test_candidate_window_covers_knn_proj_win3():
    """For every sample the merged table's valid candidate cells must
    include every valid cell of knn_proj(win=3)'s clamped round-anchored
    3x3 window (drift analysis: round(u/stride) is within [floor(uf),
    floor(uf)+2], so [-1..+3] around floor(uf) always covers it)."""
    fused, images, xyz, mask, uv, Hs, Ws = _random_inputs(1)
    V, hf, wf, Cf = fused.shape
    stride = Hs // hf
    xyz10 = xyz_window_channels(jnp.asarray(xyz), jnp.asarray(mask))
    table = pack_render_table(jnp.asarray(fused), xyz10)
    _, cx_, cy_, cz_, cvalid, cidx = sample_render_table(
        table, Cf, Hs, Ws, hf, wf, jnp.asarray(uv))
    cvalid = np.asarray(cvalid)
    cidx = np.asarray(cidx)
    # valid slots must reproduce the grid coordinates exactly (bf16 split
    # reconstruction) and carry the mask of their cell
    flat_xyz = xyz.reshape(-1, 3)
    flat_mask = mask.reshape(-1)
    got = np.stack([np.asarray(cx_)[cvalid], np.asarray(cy_)[cvalid],
                    np.asarray(cz_)[cvalid]], -1)
    np.testing.assert_allclose(got, flat_xyz[cidx[cvalid]], atol=1e-6)
    assert flat_mask[cidx[cvalid]].all()

    ufm = np.clip(uv[..., 0], 0, Ws - 1) / stride
    vfm = np.clip(uv[..., 1], 0, Hs - 1) / stride
    a_u = np.clip(np.round(ufm), 1, wf - 2).astype(int)
    a_v = np.clip(np.round(vfm), 1, hf - 2).astype(int)
    for v in range(V):
        cand_sets = [set(cidx[v, n][cvalid[v, n]])
                     for n in range(cidx.shape[1])]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cy, cx = a_v[v] + dy, a_u[v] + dx
                want = v * hf * wf + cy * wf + cx
                ok = ~mask[v].reshape(-1)[cy * wf + cx]  # invalid cells exempt
                for n in range(cidx.shape[1]):
                    assert ok[n] or want[n] in cand_sets[n], \
                        f"view {v} sample {n} misses cell ({cy[n]},{cx[n]})"


def test_window_slots_match_render_window_offsets():
    """Slot j of the candidate window must hold cell (v0+dy_j, u0+dx_j)
    for (dx_j, dy_j) = RENDER_WINDOW[j] — pack/sample index math agree."""
    fused, images, xyz, mask, uv, Hs, Ws = _random_inputs(2)
    V, hf, wf, Cf = fused.shape
    mask = np.ones_like(mask)  # all valid so every in-bounds slot is checkable
    xyz10 = xyz_window_channels(jnp.asarray(xyz), jnp.asarray(mask))
    table = pack_render_table(jnp.asarray(fused), xyz10)
    _, cx_, cy_, cz_, cvalid, cidx = sample_render_table(
        table, Cf, Hs, Ws, hf, wf, jnp.asarray(uv))
    cxyz = np.stack([np.asarray(cx_), np.asarray(cy_), np.asarray(cz_)], -1)
    scale_x, scale_y = (wf - 1) / (Ws - 1), (hf - 1) / (Hs - 1)
    u0 = np.clip(np.floor(np.clip(uv[..., 0], 0, Ws - 1) * scale_x),
                 0, wf - 2).astype(int)
    v0 = np.clip(np.floor(np.clip(uv[..., 1], 0, Hs - 1) * scale_y),
                 0, hf - 2).astype(int)
    cvalid = np.asarray(cvalid)
    cxyz = np.asarray(cxyz)
    for j, (dx, dy) in enumerate(RENDER_WINDOW):
        cy, cx = v0 + dy, u0 + dx
        inb = (cy >= 0) & (cy < hf) & (cx >= 0) & (cx < wf)
        assert (cvalid[..., j] == inb).all()
        sel = np.where(inb)
        np.testing.assert_allclose(
            cxyz[..., j, :][sel],
            xyz[sel[0], cy[sel], cx[sel]], atol=1e-6)


@pytest.fixture(scope="module")
def merged_vs_separate():
    base = Config(backbone2d_fpn_dim=16, model_3d_hidden_dim=16,
                  matcher_hidden_dim=24, n_views_train=3,
                  render=RenderConfig(N_samples=8, N_rand=8, knn_mode="proj"),
                  matching=MatchingConfig(fine_num_3d_keypoints=32,
                                          coarse_num_3d_keypoints=32))
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=3, H=64, W=96, seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    out = {}
    params = None
    for name, merged in (("merged", True), ("separate", False)):
        cfg = dataclasses.replace(
            base, render=dataclasses.replace(base.render,
                                             use_merged_table=merged))
        model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
        if params is None:
            params = jax.jit(model.init)(rng, batch, rng)
        ctx = jax.jit(lambda p, b, m=model: m.apply(
            p, b, method=m.build_context)[0])(params, batch)
        out[name] = (model, ctx)
    return params, out, batch


def test_context_tables_built_by_mode(merged_vs_separate):
    params, out, batch = merged_vs_separate
    _, ctx_m = out["merged"]
    _, ctx_s = out["separate"]
    assert ctx_m.render_table is not None
    assert ctx_m.fused_fine_packed is None and ctx_m.xyz_window_packed is None
    assert ctx_s.render_table is None
    assert ctx_s.fused_fine_packed is not None
    assert ctx_s.xyz_window_packed is not None


def test_query_fine_identical_across_table_modes(merged_vs_separate):
    """query_fine uses exact KNN + the aggregator's fused/rgb sampling, so
    switching the SceneContext to the merged table must be a pure
    refactor: identical descriptors to float tolerance."""
    params, out, batch = merged_vs_separate
    rng = np.random.default_rng(7)
    model_m, ctx_m = out["merged"]
    model_s, ctx_s = out["separate"]
    pts_np = np.asarray(ctx_m.fine.xyz)[np.asarray(ctx_m.fine.mask)]
    pts = jnp.asarray(pts_np[rng.choice(len(pts_np), 64, replace=False)]
                      + rng.normal(0, 0.01, (64, 3)).astype(np.float32))

    def qf(m, ctx):
        return m.apply(params, method=lambda mm: mm.model_3d.query_fine(ctx, pts))
    d_m = np.asarray(qf(model_m, ctx_m), np.float32)
    d_s = np.asarray(qf(model_s, ctx_s), np.float32)
    np.testing.assert_allclose(d_m, d_s, atol=5e-4, rtol=1e-3)


def test_render_rays_close_across_table_modes(merged_vs_separate):
    """The merged path's 5x5 candidate window is a superset of the
    separate path's 3x3, so neighbor sets can differ off-surface (toward
    the TRUE neighbors); rendered rgb must stay close (same bound family
    as test_render_proj_matches_flat)."""
    params, out, batch = merged_vs_separate
    pose = batch["pose"]
    R = 16
    rng = np.random.default_rng(11)
    d = np.stack([rng.uniform(-0.15, 0.15, R), rng.uniform(-0.1, 0.1, R),
                  np.ones(R)], -1).astype(np.float32)
    rays_d = jnp.asarray((np.asarray(pose[:3, :3])
                          @ (d / np.linalg.norm(d, axis=-1, keepdims=True)).T).T)
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))

    res = {}
    for name, (model, ctx) in out.items():
        res[name] = model.apply(
            params, method=lambda m: m.model_3d.render_rays(
                ctx, rays_o, rays_d, pose, False))
    rgb_m = np.asarray(res["merged"]["rgb"], np.float32)
    rgb_s = np.asarray(res["separate"]["rgb"], np.float32)
    assert np.isfinite(rgb_m).all()
    err = np.abs(rgb_m - rgb_s)
    assert err.max() < 0.05, f"max rgb divergence {err.max():.4f}"
    assert err.mean() < 0.01, f"mean rgb divergence {err.mean():.4f}"


def test_quantized_corner_table_matches_f32():
    """int8 QuantTable sampling (render.table_dtype='int8') vs the exact
    f32 packed-corner path: symmetric per-channel quantization bounds the
    per-corner error by scale/2 = amax_c/254; the bilinear blend is convex,
    so the blended error obeys the same per-channel bound (f32 out_dtype
    isolates quantization from the output cast)."""
    from nerfloc_tpu.ops.interp import quantize_pack_bilinear_corners

    rng = np.random.default_rng(7)
    V, H, W, C = 3, 12, 16, 24
    # heterogeneous per-channel ranges to exercise per-channel scales
    ch_scale = rng.uniform(0.05, 50.0, (C,)).astype(np.float32)
    feats = (rng.standard_normal((V, H, W, C)) * ch_scale).astype(np.float32)
    uv = jnp.asarray(
        rng.uniform(-2.0, 2.0, (V, 300, 2)) * np.array([W, H]) -
        np.array([1.0, 1.0]), jnp.float32)

    qt = quantize_pack_bilinear_corners(jnp.asarray(feats),
                                        out_dtype=jnp.float32)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (C,)
    got = np.asarray(packed_bilinear_sample_views(qt, H, W, uv), np.float32)
    want = np.asarray(packed_bilinear_sample_views(
        pack_bilinear_corners(jnp.asarray(feats)), H, W, uv), np.float32)
    amax = np.abs(feats).reshape(-1, C).max(0)
    err = np.abs(got - want).reshape(-1, C).max(0)
    # per-corner rounding error <= scale/2 = amax/254, preserved by the
    # convex bilinear blend; 5% slack covers f32 blend rounding
    assert (err <= amax / 254.0 * 1.05 + 1e-6).all(), \
        f"per-channel quant err ratio {np.max(err / (amax / 254.0)):.3f}"


def test_render_rays_close_with_int8_tables(merged_vs_separate):
    """render.table_dtype='int8' end to end: same params, quantized fused
    + vis corner tables; rendered rgb stays within the same bound family
    as the other table-mode equivalences."""
    params, out, batch = merged_vs_separate
    model_s, _ = out["separate"]
    cfg8 = dataclasses.replace(
        model_s.cfg, render=dataclasses.replace(model_s.cfg.render,
                                                table_dtype="int8"))
    model8 = NerfPoseEstimator(cfg8, dtype=compute_dtype_of(cfg8))
    ctx8 = jax.jit(lambda p, b: model8.apply(
        p, b, method=model8.build_context)[0])(params, batch)
    from nerfloc_tpu.ops.interp import QuantTable
    assert isinstance(ctx8.fused_fine_packed, QuantTable)

    _, ctx_s = out["separate"]
    pose = batch["pose"]
    R = 16
    rng = np.random.default_rng(13)
    d = np.stack([rng.uniform(-0.15, 0.15, R), rng.uniform(-0.1, 0.1, R),
                  np.ones(R)], -1).astype(np.float32)
    rays_d = jnp.asarray((np.asarray(pose[:3, :3])
                          @ (d / np.linalg.norm(d, axis=-1, keepdims=True)).T).T)
    rays_o = jnp.broadcast_to(pose[:3, 3], (R, 3))

    res = {}
    for name, model, ctx in (("bf16", model_s, ctx_s), ("int8", model8, ctx8)):
        res[name] = model.apply(
            params, method=lambda m: m.model_3d.render_rays(
                ctx, rays_o, rays_d, pose, False))
    rgb_q = np.asarray(res["int8"]["rgb"], np.float32)
    rgb_s = np.asarray(res["bf16"]["rgb"], np.float32)
    assert np.isfinite(rgb_q).all()
    err = np.abs(rgb_q - rgb_s)
    assert err.max() < 0.05, f"max rgb divergence {err.max():.4f}"
    assert err.mean() < 0.01, f"mean rgb divergence {err.mean():.4f}"
