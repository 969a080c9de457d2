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
      method: 'approx' (TPU PartialReduce, default), 'exact' (streamed
        top_k scan), or 'pallas' (exact VMEM-resident kernel,
        ops/knn_pallas.py — 265ms vs the scan's 437ms at 262k x 24k;
        requires the cloud to fit VMEM).

    Returns:
      (dists [N, K] squared L2 sorted ascending, idx [N, K] int32) —
      pytorch3d `knn_points(..., return_sorted=True)` semantics
      (reference knn_utils.py:97-173).
    """
    if method == "pallas":
        from .knn_pallas import knn_pallas

        return knn_pallas(queries, points, points_mask, K)

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


def knn_gather(features: Array, idx: Array) -> Array:
    """Gather [M, C] features at [N, K] indices -> [N, K, C].

    Equivalent of pytorch3d knn_gather (reference knn_utils.py:174-222).
    Negative (invalid) indices gather row 0; callers mask separately.
    """
    safe = jnp.maximum(idx, 0)
    return jnp.take(features, safe, axis=0)
