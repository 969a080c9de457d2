"""K-nearest-neighbor search, TPU-native.

Replaces the reference's CUDA KNN kernels (reference:
nerf_loc/models/ops/knn/src/knn.cu:27-441, mink.cuh register heaps, and the
pytorch3d knn_points/knn_gather import at conditional_nerf/model.py:19-20).

Two selection backends over MXU-computed blocked distances
(|q|^2 - 2 q.p + |p|^2, f32 accumulation — the TPU's default bf16 matmul
corrupts neighbor ordering, dropping recall to ~87%):

  * 'approx' (default): `jax.lax.approx_min_k` per reference-cloud tile —
    the TPU's hardware-accelerated PartialReduce top-k — followed by an
    exact merge of the per-tile candidates. ~6x faster than streamed exact
    top_k at 262k queries x 24k points (150ms vs 895ms on v5e); op-level
    neighbor recall ~99.9% at recall_target=0.95 (raising the target toward
    1.0 makes XLA fall back to a full sort that materializes the whole
    distance block -> OOM). On CPU approx_min_k lowers to exact top_k, so
    tests are bit-exact.
  * 'exact': streamed scan keeping a running [N, K] best set via lax.top_k
    over [N, K + tile] candidates.

Gradients flow through distances (the reference backward kernel
knn.cu:446-554 is replaced by autodiff). Padded clouds use `points_mask`
(masked entries get +inf), which is how the reference's dynamic `lengths`
argument (knn_utils.py:97-170) becomes static-shape.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .interp import pack_window

Array = jax.Array


def _pad_to_multiple(x: Array, multiple: int, axis: int, value):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("K", "tile", "method", "recall_target"))
def knn(queries: Array, points: Array, K: int,
        points_mask: Array | None = None, tile: int = 8192,
        method: str = "approx", recall_target: float = 0.95
        ) -> tuple[Array, Array]:
    """Find the K nearest `points` for each query.

    Args:
      queries: [N, D]; points: [M, D] (padded entries allowed).
      points_mask: optional [M] bool; False entries are excluded.
      tile: reference-cloud tile size processed per step.
      method: 'approx' (TPU PartialReduce, default) or 'exact' (streamed
        top_k scan). A VMEM-resident exact Pallas kernel existed through
        round 2 (265ms vs the scan's 437ms at 262k x 24k, but 10x slower
        than approx_min_k) and was removed; post-mortem in BASELINE.md,
        exemplar Pallas pattern kept in ops/fused_agg.py.

    Returns:
      (dists [N, K] squared L2 sorted ascending, idx [N, K] int32) —
      pytorch3d `knn_points(..., return_sorted=True)` semantics
      (reference knn_utils.py:97-173).
    """
    N, D = queries.shape
    M = points.shape[0]
    if points_mask is None:
        points_mask = jnp.ones((M,), dtype=bool)
    BIG = jnp.asarray(jnp.finfo(queries.dtype).max / 4, dtype=queries.dtype)


    pts = _pad_to_multiple(points, tile, axis=0, value=0.0)
    msk = _pad_to_multiple(points_mask, tile, axis=0, value=False)
    Mp = pts.shape[0]
    n_tiles = Mp // tile
    pts_t = pts.reshape(n_tiles, tile, D)
    msk_t = msk.reshape(n_tiles, tile)
    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [N, 1]

    def tile_dists(p, m):
        p_sq = jnp.sum(p * p, axis=-1)
        d = q_sq - 2.0 * jnp.matmul(queries, p.T, precision="highest") \
            + p_sq[None, :]
        return jnp.where(m[None, :], jnp.maximum(d, 0.0), BIG)

    if method == "approx":
        def one_tile(args):
            tile_idx, p, m = args
            d = tile_dists(p, m)
            nd, idx = jax.lax.approx_min_k(d, K, recall_target=recall_target)
            return nd, (idx + tile_idx * tile).astype(jnp.int32)

        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        # ALWAYS go through lax.map, even for one tile: inside a scan body
        # XLA fuses the [N, tile] distance block into approx_min_k's
        # PartialReduce window (temp ~2.4GB, 130ms); at top level it
        # materializes the full block (25GB -> OOM).
        nd, idx = jax.lax.map(one_tile, (tile_ids, pts_t, msk_t))
        nd = jnp.moveaxis(nd, 0, 1).reshape(N, n_tiles * K)
        idx = jnp.moveaxis(idx, 0, 1).reshape(N, n_tiles * K)
        neg, arg = jax.lax.top_k(-nd, K)  # exact merge of candidates
        return -neg, jnp.take_along_axis(idx, arg, axis=1)

    # exact: running best set through a scan
    init_d = jnp.full((N, K), BIG, dtype=queries.dtype)
    init_i = jnp.full((N, K), -1, dtype=jnp.int32)

    def step(carry, inp):
        best_d, best_i = carry
        tile_idx, p, m = inp
        d = tile_dists(p, m)
        cols = tile_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        cand_d = jnp.concatenate([best_d, d], axis=1)
        cand_i = jnp.concatenate([best_i, jnp.broadcast_to(cols, (N, tile))], axis=1)
        neg_top, arg = jax.lax.top_k(-cand_d, K)
        return (-neg_top, jnp.take_along_axis(cand_i, arg, axis=1)), None

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(step, (init_d, init_i),
                                       (tile_ids, pts_t, msk_t))
    return best_d, best_i


@partial(jax.jit, static_argnames=("K", "n_candidates", "tile",
                                   "recall_target", "selection_dtype",
                                   "return_candidates"))
def knn_rays(rays_o: Array, rays_d: Array, z_vals: Array, points: Array,
             K: int, points_mask: Array | None = None,
             n_candidates: int = 128, tile: int = 8192,
             recall_target: float = 0.95,
             selection_dtype=jnp.float32,
             return_candidates: bool = False):
    """Per-sample KNN for all samples of a ray batch, via ray-coherent pruning.

    selection_dtype defaults to exact f32; the render path passes bf16
    explicitly (halves selection traffic, ~1% candidate-recall cost at
    C=128 — see the inline note below).

    The render hot loop (reference conditional_nerf/model.py:509-517) runs
    KNN for R*S sample points against the support cloud — an [R*S, M]
    problem. But a sample at depth z on ray (o, d) has
        dist^2(p, z) = line2(p) + |d|^2 * (z - t_p)^2,
    where t_p = <p - o, d>/|d|^2 and line2 = |p - o|^2 - |d|^2 t_p^2 depend
    only on (ray, point). So: (1) select `n_candidates` points per RAY by
    distance to the [z_min, z_max] segment (an [R, M] problem — S times less
    matmul work), then (2) rank candidates per sample with the closed form
    and take the exact top-K. Candidate recall is near-1 for depth-coherent
    clouds (neighbors of adjacent samples overlap heavily); measured in
    tests/test_ops.py against exact KNN.

    Args:
      rays_o/rays_d: [R, 3] (rays_d need not be unit); z_vals: [R, S] sample
      depths; points: [M, 3]; points_mask: optional [M] validity.
    Returns:
      idx [R, S, K] int32, ascending by distance (pytorch3d order). Indices
      only — callers recompute differentiable distances from gathered
      coordinates (the knn.cu:446-554 backward becomes plain autodiff).
      With return_candidates=True, returns (idx, cand_idx [R, C] int32,
      local_idx [R, S, K] int32) where idx == take_along(cand_idx, local)
      — callers can then assemble neighbor features from per-ray candidate
      tables with a one-hot MXU matmul instead of an [R*S*K]-row gather.
    """
    R, S = z_vals.shape
    M = points.shape[0]
    dtype = rays_o.dtype
    if points_mask is None:
        points_mask = jnp.ones((M,), dtype=bool)
    BIG = jnp.asarray(jnp.finfo(dtype).max / 4, dtype=dtype)

    d_sq = jnp.sum(rays_d * rays_d, axis=-1)                    # [R]
    o_sq = jnp.sum(rays_o * rays_o, axis=-1)                    # [R]
    od = jnp.sum(rays_o * rays_d, axis=-1)                      # [R]
    z_lo = z_vals[:, 0][:, None]
    z_hi = z_vals[:, -1][:, None]

    # Candidate SELECTION can run in bf16 (selection_dtype): only membership
    # in the C-candidate set matters — the per-sample refinement below
    # re-ranks candidates with exact f32 distances — and bf16 rank noise
    # lives near the selection boundary, not among the K=8 winners. Halves
    # the [R, M] block traffic and runs the matmuls at full MXU rate; costs
    # ~1% candidate recall at C=128 (recovered by a modestly larger C; see
    # tests/test_ops.py recall checks). Centering the cloud first keeps
    # |p - o| small so bf16 cancellation stays benign.
    sd = selection_dtype
    center = jnp.mean(points, axis=0)
    pts_c = (points - center).astype(sd)
    rays_o_c = (rays_o - center).astype(sd)
    rays_d_b = rays_d.astype(sd)
    o_sq_b = jnp.sum((rays_o - center).astype(jnp.float32) ** 2,
                     axis=-1).astype(sd)
    od_b = jnp.sum((rays_o - center) * rays_d, axis=-1).astype(sd)
    d_sq_b = d_sq.astype(sd)

    # one tile when the cloud is small enough: the cross-tile merge top_k
    # costs more than the larger PartialReduce (measured 56ms -> 34ms at
    # [4096 x 24k] on v5e); the fused [R, tile] block stays well under HBM
    tile = min(tile * 4, max(tile, M + (-M) % 256))
    pts = _pad_to_multiple(pts_c, tile, axis=0, value=0.0)
    msk = _pad_to_multiple(points_mask, tile, axis=0, value=False)
    n_tiles = pts.shape[0] // tile
    pts_t = pts.reshape(n_tiles, tile, 3)
    msk_t = msk.reshape(n_tiles, tile)

    C = n_candidates
    BIG16 = jnp.asarray(3e38, jnp.float32).astype(sd)
    zlo16 = z_lo.astype(sd)
    zhi16 = z_hi.astype(sd)

    prec = "highest" if sd == jnp.float32 else None

    def seg_tile(args):
        tile_idx, p, m = args
        pd = jnp.matmul(rays_d_b, p.T, precision=prec)          # [R, T]
        po = jnp.matmul(rays_o_c, p.T, precision=prec)          # [R, T]
        p_sq = jnp.sum(p.astype(jnp.float32) ** 2,
                       axis=-1).astype(jnp.bfloat16)[None, :]   # [1, T]
        t_p = (pd - od_b[:, None]) / d_sq_b[:, None]
        diff_sq = p_sq - 2.0 * po + o_sq_b[:, None]             # |p - o|^2
        line2 = jnp.maximum(diff_sq - d_sq_b[:, None] * t_p * t_p, 0)
        dz = jnp.clip(t_p, zlo16, zhi16) - t_p
        seg = line2 + d_sq_b[:, None] * dz * dz
        seg = jnp.where(m[None, :], seg, BIG16)
        nd, idx = jax.lax.approx_min_k(seg, C, recall_target=recall_target)
        return nd, (idx + tile_idx * tile).astype(jnp.int32)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    # lax.map keeps each [R, tile] segment-distance block fused into the
    # approx_min_k PartialReduce window (same rationale as knn() above)
    nd, idx = jax.lax.map(seg_tile, (tile_ids, pts_t, msk_t))
    if n_tiles == 1:
        seg_c, cand_idx = nd[0], idx[0]
    else:
        nd = jnp.moveaxis(nd, 0, 1).reshape(R, n_tiles * C)
        idx = jnp.moveaxis(idx, 0, 1).reshape(R, n_tiles * C)
        neg, arg = jax.lax.top_k(-nd, C)
        seg_c = -neg
        cand_idx = jnp.take_along_axis(idx, arg, axis=1)        # [R, C]
    cand_valid = seg_c.astype(jnp.float32) < 1.4e38

    # exact per-sample refinement over the C candidates
    cand_pts = jnp.take(points, jnp.maximum(cand_idx, 0), axis=0)  # [R, C, 3]
    u = cand_pts - rays_o[:, None, :]
    t_p = jnp.sum(u * rays_d[:, None, :], axis=-1) / d_sq[:, None]   # [R, C]
    line2 = jnp.maximum(
        jnp.sum(u * u, axis=-1) - d_sq[:, None] * t_p * t_p, 0.0)
    dz = z_vals[:, :, None] - t_p[:, None, :]                   # [R, S, C]
    d2 = line2[:, None, :] + d_sq[:, None, None] * dz * dz
    d2 = jnp.where(cand_valid[:, None, :], d2, BIG)
    # key-value sort over the (lane-resident) candidate axis beats lax.top_k
    # (which lowers to a full variadic sort with worse layout): 4ms vs 83ms
    # at [4096, 64, 128] on v5e
    gidx = jnp.broadcast_to(cand_idx[:, None, :], d2.shape)
    if not return_candidates:
        _, sidx = jax.lax.sort([d2, gidx], num_keys=1, dimension=2)
        return sidx[..., :K]
    lidx = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, None, :],
                            d2.shape)
    _, sidx, slid = jax.lax.sort([d2, gidx, lidx], num_keys=1, dimension=2)
    return sidx[..., :K], cand_idx, slid[..., :K]


def _proj_window(win: int):
    r = win // 2
    return tuple((dx, dy) for dy in range(-r, r + 1) for dx in range(-r, r + 1))


PROJ_WINDOW = _proj_window(3)


@jax.custom_vjp
def split_bf16x3(x: Array):
    """Split f32 into three bf16 components whose f32 sum recovers x to
    ~24 mantissa bits (for storing exact-rank geometry in bf16 tables:
    f32 row gathers measured ~8x slower than bf16 on v5e).

    Bit-masked truncation, NOT FP subtract-and-round: the axon terminal
    forces --xla_allow_excess_precision=true, under which XLA folds the
    `x - cvt(cvt(x, bf16), f32)` convert pairs and the reconstruction
    degrades to hi-level error (measured 1.5e-2 max on v5e). Masking the
    low mantissa bits through bitcasts is exact and cannot be simplified
    away. Each truncated value has only the top-16 f32 bits set, so its
    bf16 cast and the f32 residual subtractions are exact.

    Differentiable with a custom VJP: bitcasts have no derivative, but
    every consumer reconstructs by SUMMING the components (hi+mid+lo == x
    exactly), so the correct pullback is dx = dhi + dmid + dlo. This keeps
    gradients flowing through bf16 split tables (e.g. neural-point
    confidence in the render query) during training.
    """
    return _split_bf16x3_impl(x)


def _split_bf16x3_impl(x: Array):
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    r1 = x - hi
    b1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid = jax.lax.bitcast_convert_type(b1 & jnp.uint32(0xFFFF0000),
                                       jnp.float32)
    lo = r1 - mid
    bf = jnp.bfloat16
    return hi.astype(bf), mid.astype(bf), lo.astype(bf)


def _split_bf16x3_fwd(x):
    return _split_bf16x3_impl(x), None


def _split_bf16x3_bwd(_, cts):
    dhi, dmid, dlo = cts
    return ((dhi.astype(jnp.float32) + dmid.astype(jnp.float32)
             + dlo.astype(jnp.float32)),)


split_bf16x3.defvjp(_split_bf16x3_fwd, _split_bf16x3_bwd)


def xyz_window_channels(xyz_maps: Array, mask_maps: Array) -> Array:
    """[V, h, w, 3] f32 point maps + [V, h, w] validity -> [V, h, w, 10]:
    xyz split into three bf16 components (split_bf16x3 — reconstructed by
    an f32 sum to ~24 mantissa bits) plus the validity bit. The per-cell
    channel layout of both pack_xyz_window and the merged render table
    (ops/interp.pack_render_table)."""
    hi, mid, lo = split_bf16x3(xyz_maps)
    return jnp.concatenate([hi, mid, lo,
                            mask_maps[..., None].astype(jnp.bfloat16)],
                           axis=-1)


def pack_xyz_window(xyz_maps: Array, mask_maps: Array, win: int = 3) -> Array:
    """Build the knn_proj candidate table: [V, h, w, 3] f32 point maps +
    [V, h, w] validity -> flat packed [V*h*w, win^2*10] bf16 window table.

    win=3 covers the at-surface 8-NN at 0.97 recall; win=5 reaches 1.00
    at-surface and 0.45 in the 6-30cm band at ~2.8x the table width
    (tools/knn_recall_study.py).
    """
    return pack_window(xyz_window_channels(xyz_maps, mask_maps),
                       _proj_window(win))


def knn_proj(xyz: Array, uv_fm: Array, front: Array, packed: Array,
             h: int, w: int, K: int, win: int = 3) -> Array:
    """Projection-window KNN for render samples against support neural
    points (TPU-native replacement for per-sample exact KNN in the render
    hot loop, reference model.py:509-517 / pytorch3d knn_points).

    The fine neural points ARE the stride-s pixel grid of each support
    view (conditional_nerf._backproject_level), so a sample's plausible
    neighbors are the 3x3 featmap window around its projection in each
    view — V*9 analytic candidates, exact f32 re-rank, top-K. No segment
    search: per-ray segment-distance pruning (knn_rays) collapses on
    production-density clouds (measured 6.5% candidate recall at
    [4096 rays x 24k pts] — thousands of points tie at ~0 segment
    distance), while this scheme measures 0.97 recall for samples whose
    nearest neighbor is within 2 grid spacings (vs 0.57 for knn_rays;
    tools/knn_recall_study.py), which is where neighbors carry weight —
    off-surface samples' true neighbors are 5-90x the point spacing away
    for every method and their 1/dist aggregation weights are diffuse.

    Args:
      xyz: [N, 3] f32 sample points; uv_fm: [V, N, 2] projections in
      FEATMAP pixel coords (full-res uv / stride); front: [V, N] bool —
      projection usable (in front of camera & inside the image);
      packed: pack_xyz_window table; h/w: featmap dims; K: neighbors.
    Returns: idx [N, K] int32 into the flat [V*h*w] point array, ascending
      by distance. Border clipping can duplicate edge pixels among the 45
      candidates; downstream 1/dist weighting tolerates the double-count.
    """
    V, N = uv_fm.shape[0], uv_fm.shape[1]
    offs = _proj_window(win)
    O = len(offs)
    r = win // 2
    u0 = jnp.clip(jnp.round(uv_fm[..., 0]), r, w - 1 - r).astype(jnp.int32)
    v0 = jnp.clip(jnp.round(uv_fm[..., 1]), r, h - 1 - r).astype(jnp.int32)
    base = (jnp.arange(V, dtype=jnp.int32) * (h * w))[:, None]
    row = (base + v0 * w + u0).reshape(-1)              # [V*N]
    g = jnp.take(packed, row, axis=0).reshape(V, N, O, 10)
    cand_xyz = (g[..., 0:3].astype(jnp.float32)
                + g[..., 3:6].astype(jnp.float32)
                + g[..., 6:9].astype(jnp.float32))      # [V, N, O, 3]
    valid = (g[..., 9] > 0.5) & front[:, :, None]

    dxs = jnp.asarray([o[0] for o in offs], jnp.int32)
    dys = jnp.asarray([o[1] for o in offs], jnp.int32)
    idx = (base[:, :, None] + (v0[:, :, None] + dys) * w
           + (u0[:, :, None] + dxs))                    # [V, N, O]
    return knn_from_candidates(xyz, cand_xyz, valid, idx, K)


def knn_from_candidates(xyz: Array, cand_xyz: Array, cand_valid: Array,
                        cand_idx: Array, K: int) -> Array:
    """Exact f32 re-rank of per-view candidate sets to top-K neighbors.

    Args: xyz [N, 3] f32 sample points; cand_xyz [V, N, O, 3] f32
      candidate points; cand_valid [V, N, O] bool; cand_idx [V, N, O]
      int32 flat indices into the support point array.
    Returns: idx [N, K] int32, ascending by distance. Shared tail of
    knn_proj and the merged render-table path
    (ops/interp.sample_render_table): a key-value sort over the
    lane-resident candidate axis beats lax.top_k on TPU (4ms vs 83ms at
    [4096*64, 128] — top_k lowers to a full variadic sort with worse
    layout).
    """
    V, N, O = cand_idx.shape
    d2 = jnp.sum((xyz[None, :, None, :] - cand_xyz) ** 2, axis=-1)
    BIG = jnp.finfo(jnp.float32).max / 4
    d2 = jnp.where(cand_valid, d2, BIG)
    d2f = jnp.moveaxis(d2, 0, 1).reshape(N, V * O)
    idxf = jnp.moveaxis(cand_idx, 0, 1).reshape(N, V * O)
    _, si = jax.lax.sort([d2f, idxf], num_keys=1, dimension=1)
    return si[:, :K]


def knn_from_candidate_planes(xyz: Array, cand_x: Array, cand_y: Array,
                              cand_z: Array, cand_valid: Array,
                              cand_idx: Array, K: int) -> Array:
    """knn_from_candidates on per-axis coordinate planes.

    Tail of the merged render-table path (ops/interp.sample_render_table):
    candidate coordinates arrive as three [V, N, O] planes (contiguous
    channel-major table slices) so the squared distance is computed
    per-component and no [V, N, O, 3] relayout materializes — stride-10
    lane slicing of the offset-major layout measured ~2x the gather's own
    cost on v5e. Args/returns otherwise as knn_from_candidates.
    """
    V, N, O = cand_idx.shape
    d2 = ((xyz[None, :, None, 0] - cand_x) ** 2
          + (xyz[None, :, None, 1] - cand_y) ** 2
          + (xyz[None, :, None, 2] - cand_z) ** 2)
    BIG = jnp.finfo(jnp.float32).max / 4
    d2 = jnp.where(cand_valid, d2, BIG)
    d2f = jnp.moveaxis(d2, 0, 1).reshape(N, V * O)
    idxf = jnp.moveaxis(cand_idx, 0, 1).reshape(N, V * O)
    _, si = jax.lax.sort([d2f, idxf], num_keys=1, dimension=1)
    return si[:, :K]


def knn_gather(features: Array, idx: Array) -> Array:
    """Gather [M, C] features at [N, K] indices -> [N, K, C].

    Equivalent of pytorch3d knn_gather (reference knn_utils.py:174-222).
    Negative (invalid) indices gather row 0; callers mask separately.
    """
    safe = jnp.maximum(idx, 0)
    return jnp.take(features, safe, axis=0)
