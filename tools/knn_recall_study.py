"""Render-KNN candidate recall at production scale (BASELINE.md study).

Measures, on the real bench scene ([R rays x S samples] vs the V-view
backprojected cloud), the recall of each render KNN mode's candidate set
against brute-force exact 8-NN — overall and bucketed by the sample's
depth relative to the query-view surface. This is the experiment that
retired knn_rays' segment pruning as the default (6.5% overall recall at
production density) in favor of projection-window KNN (0.99 at-surface).

Usage (real TPU or CPU, ~2 min):  python tools/knn_recall_study.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nerfloc_tpu.configs import Config, MatchingConfig, RenderConfig, compute_dtype_of
from nerfloc_tpu.data import device_batch, make_query_batch
from nerfloc_tpu.geometry.cameras import rays_for_pixels
from nerfloc_tpu.models.fields.projector import compute_projections
from nerfloc_tpu.models.pose_estimator import NerfPoseEstimator
from nerfloc_tpu.ops.knn import knn_proj, knn_rays


def main(R: int = 128, S: int = 64):
    cfg = Config(backbone2d_fpn_dim=192, model_3d_hidden_dim=128,
                 matcher_hidden_dim=192,
                 # separate tables: this study probes the standalone
                 # knn_proj op (the merged render table has its own
                 # coverage tests, tests/test_render_table.py)
                 render=RenderConfig(N_samples=S, N_rand=1024,
                                     use_merged_table=False),
                 matching=MatchingConfig(fine_num_3d_keypoints=1024))
    model = NerfPoseEstimator(cfg, dtype=compute_dtype_of(cfg))
    H, W, V = 240, 320, 5
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(make_query_batch(n_views=V, H=H, W=W, seed=0)).items()}
    rng = jax.random.PRNGKey(0)
    small = dict(batch)
    s = 128
    for k in ("image", "depth"):
        small[k] = batch[k][:s, :s]
    for k in ("topk_images", "topk_depths"):
        small[k] = batch[k][:, :s, :s]
    params = jax.jit(model.init)(rng, small, rng)
    ctx = jax.jit(lambda p, b: model.apply(p, b, method=model.build_context)[0])(
        params, batch)

    pts = np.asarray(ctx.fine.xyz)
    mask = np.asarray(ctx.fine.mask)
    near, far = float(ctx.sv.near), float(ctx.sv.far)
    print(f"cloud {pts.shape[0]} pts ({mask.sum()} valid), "
          f"near={near:.2f} far={far:.2f}")

    rngs = jax.random.split(rng, 2)
    uv = jnp.stack([
        jax.random.uniform(rngs[0], (R,), minval=0, maxval=W - 1),
        jax.random.uniform(rngs[1], (R,), minval=0, maxval=H - 1)], -1)
    rays_o, rays_d = rays_for_pixels(uv, batch["K"], batch["pose"])
    t = np.linspace(0.0, 1.0, S, dtype=np.float32)
    z = near * (1 - t) + far * t
    z_vals = np.broadcast_to(z, (R, S)).copy()

    samples = (np.asarray(rays_o)[:, None, :]
               + np.asarray(rays_d)[:, None, :] * z_vals[..., None])
    flat = samples.reshape(-1, 3)
    ptsm = pts.copy()
    ptsm[~mask] = 1e9
    exact = np.zeros((R * S, 8), np.int64)
    nn_dist = np.zeros(R * S, np.float32)
    for i in range(0, R * S, 1024):
        dd = ((flat[i:i + 1024, None, :] - ptsm[None]) ** 2).sum(-1)
        srt = np.argsort(dd, axis=1)
        exact[i:i + 1024] = srt[:, :8]
        nn_dist[i:i + 1024] = np.sqrt(
            dd[np.arange(len(srt)), srt[:, 0]])

    idx_ray = np.asarray(knn_rays(rays_o, rays_d, jnp.asarray(z_vals),
                                  ctx.fine.xyz, K=8,
                                  points_mask=ctx.fine.mask,
                                  n_candidates=128)).reshape(R * S, 8)
    hf, wf = ctx.feat_fine_src.shape[1:3]
    proj = compute_projections(jnp.asarray(flat), ctx.sv.Ks, ctx.sv.poses,
                               H, W)
    idx_proj = np.asarray(knn_proj(jnp.asarray(flat),
                                   proj.uv / float(H // hf),
                                   proj.in_front, ctx.xyz_window_packed,
                                   hf, wf, K=8))

    # diagnostic: candidate-SET recall of the proj window (before top-K),
    # from the same projections knn_proj used
    uvn = np.asarray(proj.uv) / float(H // hf)
    frontn = np.asarray(proj.in_front)
    u0 = np.clip(np.round(uvn[..., 0]), 1, wf - 2).astype(np.int64)
    v0 = np.clip(np.round(uvn[..., 1]), 1, hf - 2).astype(np.int64)
    cand_list = []
    for v in range(V):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                c = v * hf * wf + (v0[v] + dy) * wf + (u0[v] + dx)
                c = np.where(frontn[v], c, -1)
                cand_list.append(c)
    cand = np.stack(cand_list, -1)

    # bucket by the exact nearest-neighbor distance (convention-free:
    # "at the surface" == the nearest point is within ~2 grid spacings;
    # stride-4 point spacing on this scene is ~0.03)
    buckets = [("all", 0.0, 1e9), ("NN<=6cm (surface)", 0.0, 0.06),
               ("NN 6cm-30cm", 0.06, 0.30), ("NN>30cm (far)", 0.30, 1e9)]
    print(f"{'bucket':18s} {'n':>6s} {'knn_rays':>9s} {'knn_proj':>9s} "
          f"{'cand-set':>9s}")
    for name, lo, hi in buckets:
        m = (nn_dist >= lo) & (nn_dist < hi)
        if not m.any():
            continue
        recs = []
        for idx in (idx_ray, idx_proj, cand):
            recs.append(np.mean([len(set(idx[i]) & set(exact[i])) / 8.0
                                 for i in np.where(m)[0]]))
        print(f"{name:18s} {m.sum():6d} {recs[0]:9.3f} {recs[1]:9.3f} "
              f"{recs[2]:9.3f}")


if __name__ == "__main__":
    main()
