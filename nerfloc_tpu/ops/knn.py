"""K-nearest-neighbor search, TPU-native.

Replaces the reference's CUDA KNN kernels (reference:
nerf_loc/models/ops/knn/src/knn.cu:27-441, mink.cuh register heaps, and the
pytorch3d knn_points/knn_gather import at conditional_nerf/model.py:19-20).

Design: instead of per-thread register heaps, we stream the reference cloud
through in tiles with `lax.scan`, computing each [N, TILE] squared-distance
block on the MXU (|q|^2 - 2 q.p + |p|^2 as a matmul) and maintaining a running
[N, K] best set via `lax.top_k` over the concatenated [N, K + TILE] candidates.
The full [N, M] distance matrix is never materialized, so memory is
O(N * (K + TILE)) regardless of cloud size. Gradients flow through distances
(the reference backward kernel knn.cu:446-554 is replaced by autodiff).

Supports padded clouds via `points_mask` (padded entries get +inf distance),
which is how the reference's dynamic `lengths` argument (knn_utils.py:97-170)
becomes static-shape.
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


@partial(jax.jit, static_argnames=("K", "tile"))
def knn(queries: Array, points: Array, K: int, points_mask: Array | None = None,
        tile: int = 2048) -> tuple[Array, Array]:
    """Find the K nearest `points` for each query.

    Args:
      queries: [N, D] query positions.
      points: [M, D] reference cloud (padded entries allowed).
      K: number of neighbours.
      points_mask: optional [M] bool; False entries are excluded.
      tile: reference-cloud tile size per scan step.

    Returns:
      (dists [N, K] squared distances sorted ascending, idx [N, K] int32).
      Matches pytorch3d `knn_points(..., return_sorted=True)` semantics
      (squared L2, ascending), cf. reference knn_utils.py:97-173.
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

    init_d = jnp.full((N, K), BIG, dtype=queries.dtype)
    init_i = jnp.full((N, K), -1, dtype=jnp.int32)

    def step(carry, inp):
        best_d, best_i = carry
        tile_idx, p, m = inp
        # squared distances on the MXU: |q|^2 - 2 q.p + |p|^2
        p_sq = jnp.sum(p * p, axis=-1)  # [tile]
        d = q_sq - 2.0 * (queries @ p.T) + p_sq[None, :]  # [N, tile]
        d = jnp.maximum(d, 0.0)
        d = jnp.where(m[None, :], d, BIG)
        cols = tile_idx * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        cand_d = jnp.concatenate([best_d, d], axis=1)
        cand_i = jnp.concatenate([best_i, jnp.broadcast_to(cols, (N, tile))], axis=1)
        neg_top, arg = jax.lax.top_k(-cand_d, K)
        return (-neg_top, jnp.take_along_axis(cand_i, arg, axis=1)), None

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(step, (init_d, init_i), (tile_ids, pts_t, msk_t))
    return best_d, best_i


def knn_gather(features: Array, idx: Array) -> Array:
    """Gather [M, C] features at [N, K] indices -> [N, K, C].

    Equivalent of pytorch3d knn_gather (reference knn_utils.py:174-222).
    Negative (invalid) indices gather row 0; callers mask separately.
    """
    safe = jnp.maximum(idx, 0)
    return jnp.take(features, safe, axis=0)
