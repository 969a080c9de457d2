"""Alternative LoFTR-style coarse matching heads: dual-softmax / sinkhorn.

Rebuild of CoarseMatching (reference: nerf_loc/models/matching/
coarse_matching.py:59-317 — kept by the reference as an alternative to the
S2D head, constructed only in commented code at matcher.py:23-33). Provided
for parity; static-shape outputs follow the same (match_j, match_mask)
contract as matching.mutual_nearest_matches.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_INF = 1e9


def dual_softmax_confidence(feat0: Array, feat1: Array,
                            temperature: float = 0.1,
                            mask0: Optional[Array] = None,
                            mask1: Optional[Array] = None) -> Array:
    """conf[l, s] = softmax_l(sim) * softmax_s(sim) (reference :112-120).

    feat0 [L, C], feat1 [S, C] -> [L, S] confidences in (0, 1).
    """
    C = feat0.shape[-1]
    f0 = feat0 / (C ** 0.5)
    f1 = feat1 / (C ** 0.5)
    sim = jnp.matmul(f0, f1.T, precision="highest") / temperature
    if mask0 is not None:
        sim = jnp.where(mask0[:, None], sim, -_INF)
    if mask1 is not None:
        sim = jnp.where(mask1[None, :], sim, -_INF)
    return jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)


def log_optimal_transport(scores: Array, bin_score: Array,
                          iters: int = 3) -> Array:
    """Sinkhorn with a dustbin row/column in log space (reference
    :122-141 via the SuperGlue formulation). scores [L, S] ->
    log assignment [L+1, S+1]."""
    L, S = scores.shape
    alpha = jnp.broadcast_to(bin_score, (1,))
    couplings = jnp.block([
        [scores, jnp.broadcast_to(alpha, (L, 1))],
        [jnp.broadcast_to(alpha, (1, S)), alpha[None]],
    ])
    norm = -jnp.log(jnp.asarray(L + S, scores.dtype))
    log_mu = jnp.concatenate([jnp.full((L,), norm),
                              jnp.log(jnp.asarray(S, scores.dtype)) + norm[None]])
    log_nu = jnp.concatenate([jnp.full((S,), norm),
                              jnp.log(jnp.asarray(L, scores.dtype)) + norm[None]])
    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    return couplings + u[:, None] + v[None, :] - norm


def sinkhorn_confidence(feat0: Array, feat1: Array, bin_score: Array,
                        iters: int = 3, mask0: Optional[Array] = None,
                        mask1: Optional[Array] = None) -> Array:
    """Sinkhorn/OT confidence matrix (reference :122-147), [L, S]."""
    C = feat0.shape[-1]
    sim = jnp.matmul(feat0 / (C ** 0.5), (feat1 / (C ** 0.5)).T,
                     precision="highest")
    if mask0 is not None:
        sim = jnp.where(mask0[:, None], sim, -_INF)
    if mask1 is not None:
        sim = jnp.where(mask1[None, :], sim, -_INF)
    log_assign = log_optimal_transport(sim, bin_score, iters)
    return jnp.exp(log_assign)[:-1, :-1]


def coarse_match_from_confidence(conf: Array, thr: float = 0.2
                                 ) -> Tuple[Array, Array]:
    """Mutual-nearest + threshold selection (reference get_coarse_match,
    :160-236) in static-shape (match_j [L], match_mask [L]) form."""
    j_best = jnp.argmax(conf, axis=1)
    row_max = jnp.max(conf, axis=1)
    col_max = jnp.max(conf, axis=0)
    mutual = row_max >= jnp.take(col_max, j_best)
    return j_best.astype(jnp.int32), mutual & (row_max > thr)


def coarse_matching_loss(conf: Array, conf_gt: Array,
                         focal_alpha: float = 0.25, focal_gamma: float = 2.0,
                         pos_weight: float = 1.0, neg_weight: float = 1.0
                         ) -> Array:
    """Focal BCE on the confidence matrix (reference :238-317 'focal'),
    masked-mean over positives and negatives separately."""
    conf = jnp.clip(conf, 1e-6, 1.0 - 1e-6)
    pos = conf_gt > 0.5
    pos_loss = -focal_alpha * (1.0 - conf) ** focal_gamma * jnp.log(conf)
    neg_loss = -focal_alpha * conf ** focal_gamma * jnp.log(1.0 - conf)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    n_neg = jnp.maximum(jnp.sum(~pos), 1.0)
    return (pos_weight * jnp.sum(jnp.where(pos, pos_loss, 0.0)) / n_pos
            + neg_weight * jnp.sum(jnp.where(~pos, neg_loss, 0.0)) / n_neg)
