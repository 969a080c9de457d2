"""Pallas TPU kernel for exact K-nearest-neighbor search (D=3, small K).

The register-heap CUDA kernels of the reference (reference: nerf_loc/models/
ops/knn/src/knn.cu:27-441 + mink.cuh MinK heaps) become one Pallas program:
the reference cloud stays resident in VMEM, each grid step streams a block of
queries, distances are computed on the MXU, and the running top-K is
maintained with vectorized iterative min-extraction (the VPU analogue of the
register heap). No [N, M] matrix ever touches HBM.

Backward (reference knn.cu:446-554, atomicAdd scatter) is an analytic
custom VJP: d d_k / d q = 2 (q - p_idx), d d_k / d p = scatter of the
negative — expressed with JAX gather/segment_sum instead of atomics.

STATUS (round-3 decision): kept as the documented Pallas exact-KNN
exemplar + the analytic-VJP counterpart of the reference backward kernel,
but NOT on any default path — the XLA approx_min_k/blocked formulations in
ops/knn.py measured faster at production shapes on v5e in rounds 1 and 2
(per-Pallas-tile dispatch overhead ~1-2us dominates at these tile counts;
BASELINE.md post-mortems). Exact-parity tested in tests/test_knn_pallas.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 3.0e38


def _knn_kernel(q_ref, p_ref, psq_ref, out_d_ref, out_i_ref, *, K: int,
                MT: int, n_tiles: int):
    q = q_ref[:]                                     # [BN, D]
    BN = q.shape[0]
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)     # [BN, 1]

    col = jax.lax.broadcasted_iota(jnp.int32, (BN, MT), 1)
    col2k = jax.lax.broadcasted_iota(jnp.int32, (BN, 2 * K), 1)

    def tile_step(t, carry):
        best_d, best_i = carry
        pt = p_ref[pl.ds(t * MT, MT), :]             # [MT, D]
        # psq holds |p|^2 + mask penalty (BIG on invalid/padded points)
        psq = psq_ref[pl.ds(t * MT, MT)]             # [MT]
        # f32-precision dot: the MXU's default bf16 input rounding corrupts
        # neighbor ordering (recall drops to ~87%)
        qp = jax.lax.dot_general(q, pt, (((1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        d = q_sq - 2.0 * qp + psq[None, :]            # [BN, MT]

        def extract(carry_in):
            best_d, best_i = carry_in
            dd = d
            # top-K of this tile: K vectorized min-extractions
            tile_d = []
            tile_i = []
            for _ in range(K):
                m = jnp.min(dd, axis=1)               # [BN]
                a = jnp.argmin(dd, axis=1).astype(jnp.int32)
                tile_d.append(m)
                tile_i.append(a + t * MT)
                dd = jnp.where(col == a[:, None], _BIG, dd)
            tile_d = jnp.stack(tile_d, axis=1)        # [BN, K]
            tile_i = jnp.stack(tile_i, axis=1)

            # merge with the running best: K smallest of 2K candidates
            cand_d = jnp.concatenate([best_d, tile_d], axis=1)  # [BN, 2K]
            cand_i = jnp.concatenate([best_i, tile_i], axis=1)
            new_d = []
            new_i = []
            for _ in range(K):
                m = jnp.min(cand_d, axis=1)
                a = jnp.argmin(cand_d, axis=1).astype(jnp.int32)
                onehot = col2k == a[:, None]
                new_d.append(m)
                new_i.append(jnp.sum(jnp.where(onehot, cand_i, 0), axis=1))
                cand_d = jnp.where(onehot, _BIG, cand_d)
            return (jnp.stack(new_d, axis=1),
                    jnp.stack(new_i, axis=1).astype(jnp.int32))

        # tile pruning: rays in a block are spatially coherent, so once the
        # running top-K tightens, most tiles cannot contribute for ANY row
        # of the block — skip the (expensive) extraction loop entirely then
        can_contribute = jnp.min(d) < jnp.max(best_d[:, K - 1])
        return jax.lax.cond(can_contribute, extract,
                            lambda c: c, (best_d, best_i))

    init = (jnp.full((BN, K), _BIG, dtype=jnp.float32),
            jnp.zeros((BN, K), dtype=jnp.int32))
    # fori_loop (not a python unroll) so only ONE [BN, MT] distance block is
    # live at a time — the unrolled form blew the 16MB VMEM scoped limit
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, tile_step, init)

    out_d_ref[:] = best_d
    out_i_ref[:] = best_i


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("K", "block_n", "tile_m",
                                             "interpret"))
def _knn_forward(queries: Array, points: Array, psq_pen: Array, K: int,
                 block_n: int = 512, tile_m: int = 2048,
                 interpret: bool = False) -> Tuple[Array, Array]:
    N, D = queries.shape
    Mp = points.shape[0]
    n_tiles = Mp // tile_m
    Np = _round_up(N, block_n)
    qp = jnp.pad(queries, ((0, Np - N), (0, 0)))

    kernel = functools.partial(_knn_kernel, K=K, MT=tile_m, n_tiles=n_tiles)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(Np // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, K), jnp.float32),
            jax.ShapeDtypeStruct((Np, K), jnp.int32),
        ],
        interpret=interpret,
    )(qp, points, psq_pen)
    return out_d[:N], out_i[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def knn_pallas(queries: Array, points: Array, points_mask: Array | None,
               K: int, tile_m: int = 2048) -> Tuple[Array, Array]:
    """Exact KNN: (sq dists [N, K] ascending, idx [N, K] int32).

    The reference cloud must be small enough to reside in VMEM
    (~<= 200k points at D=3 f32). Falls back to interpret mode off-TPU.
    """
    d, i, _ = _knn_impl(queries, points, points_mask, K, tile_m)
    return d, i


def _knn_impl(queries, points, points_mask, K, tile_m):
    M = points.shape[0]
    Mp = _round_up(M, tile_m)
    pp = jnp.pad(points.astype(jnp.float32), ((0, Mp - M), (0, 0)))
    if points_mask is None:
        pen = jnp.zeros((M,), jnp.float32)
    else:
        pen = jnp.where(points_mask, 0.0, _BIG).astype(jnp.float32)
    pen = jnp.pad(pen, (0, Mp - M), constant_values=_BIG)
    psq_pen = jnp.sum(pp * pp, axis=-1) + pen
    interpret = jax.default_backend() != "tpu"
    d, i = _knn_forward(queries.astype(jnp.float32), pp, psq_pen, K,
                        tile_m=tile_m, interpret=interpret)
    return jnp.maximum(d, 0.0), i, None


def _knn_fwd(queries, points, points_mask, K, tile_m):
    d, i, _ = _knn_impl(queries, points, points_mask, K, tile_m)
    return (d, i), (queries, points, i)


def _knn_bwd(K, tile_m, res, grads):
    queries, points, idx = res
    g_d, _ = grads  # [N, K]; no gradient through indices
    nb = points[idx]                          # [N, K, 3]
    diff = 2.0 * (queries[:, None, :] - nb)   # d dist^2 / d q
    g_q = jnp.sum(g_d[..., None] * diff, axis=1)
    # scatter-add the -diff contributions onto the points
    flat_idx = idx.reshape(-1)
    flat_val = (-g_d[..., None] * diff).reshape(-1, 3)
    g_p = jax.ops.segment_sum(flat_val, flat_idx,
                              num_segments=points.shape[0])
    return g_q, g_p, None


knn_pallas.defvjp(_knn_fwd, _knn_bwd)
