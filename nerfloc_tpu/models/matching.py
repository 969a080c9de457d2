"""Coarse (sparse-to-dense) and fine (windowed soft-argmax) matching heads.

Rebuild of the reference matcher stack with static shapes:
  - S2DMatching (reference: nerf_loc/models/matching/sparse_to_dense.py:80-151):
    per-pair MLP over the elementwise product of descriptors -> score matrix,
    mutual-nearest filtering with threshold. The reference materializes the
    full [N, M, C] outer product (:125); here we compute it in row tiles via
    lax.map so peak memory is O(tile * M * C) — the full [N, M, 128] activation
    at N=1024, M=2048 would be 1GB.
  - Mutual-NN selection returns FIXED-SHAPE (match_j [N], match_mask [N])
    instead of the reference's variable-length i_ids/j_ids (:136-142).
  - SigmoidFocalClassificationLoss (:14-78) in masked form.
  - FinePreprocess (fine_matching.py:10-76): instead of F.unfold over the whole
    fine map, gathers the 7x7 window around each match directly.
  - FineMatching (fine_matching.py:79-207): per-window expectation (dsnt) with
    std, l2 / l2_with_std losses; 'false supervision' DDP workaround becomes a
    clean masked mean (no collective deadlock exists under SPMD).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def sigmoid_focal_loss(logits: Array, targets: Array, alpha: float = 0.25,
                       gamma: float = 2.0) -> Array:
    """Elementwise focal BCE (reference sparse_to_dense.py:14-78)."""
    pred = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    pt = targets * (1.0 - pred) + (1.0 - targets) * pred
    focal_w = alpha_w * jnp.power(pt, gamma)
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return focal_w * bce


class ScoreMLP(nn.Module):
    """3-layer MLP scoring head shared by coarse and fine matchers
    (sparse_to_dense.py:83-89, fine_matching.py:86-92)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(1, dtype=self.dtype, name="fc3")(x)[..., 0]


class S2DMatching(nn.Module):
    """Sparse(3D)-to-dense(2D) coarse matcher."""
    thr: float = 0.2
    row_tile: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, desc3d: Array, desc2d: Array,
                 mask2d: Optional[Array] = None) -> Array:
        """Returns conf logits [N, M]. desc3d [N, C], desc2d [M, C]."""
        N, C = desc3d.shape
        mlp = ScoreMLP(dtype=self.dtype, name="mlps")
        if self.is_initializing():
            # create the MLP params OUTSIDE lax.map: param creation inside a
            # scanned body leaks tracers out of the scan trace.
            return mlp(desc3d[:, None, :] * desc2d[None, :1, :]) \
                @ jnp.ones((1, desc2d.shape[0]), desc3d.dtype)

        tile = min(self.row_tile, N)
        pad = (-N) % tile
        d3 = jnp.pad(desc3d, ((0, pad), (0, 0))) if pad else desc3d

        def row_block(block):  # [tile, C]
            x = block[:, None, :] * desc2d[None, :, :]  # [tile, M, C]
            return mlp(x)  # [tile, M]

        blocks = d3.reshape(-1, tile, C)
        conf = jax.lax.map(row_block, blocks).reshape(-1, desc2d.shape[0])[:N]
        if mask2d is not None:
            conf = jnp.where(mask2d[None, :], conf, -1e9)
        return conf


def mutual_nearest_matches(scores: Array, thr: float,
                           mask2d: Optional[Array] = None) -> Tuple[Array, Array]:
    """Static-shape mutual-nearest filtering (sparse_to_dense.py:136-142).

    Args: scores [N, M] in (0,1) (post-sigmoid).
    Returns: (match_j [N] int32, match_mask [N] bool).
    """
    if mask2d is not None:
        scores = jnp.where(mask2d[None, :], scores, -1.0)
    j_best = jnp.argmax(scores, axis=1)
    row_max = jnp.max(scores, axis=1)
    col_max = jnp.max(scores, axis=0)  # [M]
    mutual = row_max >= jnp.take(col_max, j_best)
    valid = mutual & (row_max > thr)
    return j_best.astype(jnp.int32), valid


def coarse_loss(conf_logits: Array, conf_gt: Array, valid: Optional[Array] = None) -> Array:
    """Masked mean focal loss over the [N, M] grid (sparse_to_dense.py:93-114)."""
    loss = sigmoid_focal_loss(conf_logits, conf_gt)
    if valid is None:
        return jnp.mean(loss)
    w = valid.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def gather_windows(feat: Array, centers: Array, window: int) -> Tuple[Array, Array]:
    """Gather [window x window] patches of an [H, W, C] map around integer
    centers [M, 2] (x, y). Replaces F.unfold+select (fine_matching.py:53-57);
    out-of-bounds taps are zero (unfold zero-padding semantics).

    Returns (patches [M, window*window, C], valid [M, window*window]).
    """
    H, W, C = feat.shape
    r = window // 2
    off = jnp.arange(-r, r + 1)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")  # [w,w]
    px = centers[:, 0:1] + ox.reshape(1, -1)  # [M, ww]
    py = centers[:, 1:2] + oy.reshape(1, -1)
    inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    idx = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
    patches = jnp.take(feat.reshape(H * W, C), idx, axis=0)
    patches = patches * inb[..., None].astype(patches.dtype)
    return patches, inb


class FinePreprocess(nn.Module):
    """Project gathered fine-feature windows to matcher width
    (fine_matching.py:26,74)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches: Array) -> Array:
        return nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(patches)


class FineMatching(nn.Module):
    """Expected-coordinate regression over a window heatmap
    (fine_matching.py:94-143)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat3d: Array, feat2d_win: Array) -> Array:
        """feat3d [M, C], feat2d_win [M, WW, C] -> expec [M, 3] (x, y, std),
        coordinates normalized to [-1, 1] over the window."""
        M, WW, C = feat2d_win.shape
        W = int(round(WW ** 0.5))
        sim = feat3d[:, None, :] * feat2d_win  # [M, WW, C]
        sim = ScoreMLP(dtype=self.dtype, name="mlps")(sim)  # [M, WW]
        heat = jax.nn.softmax(sim / (C ** 0.5), axis=1)

        lin = jnp.linspace(-1.0, 1.0, W)
        gx, gy = jnp.meshgrid(lin, lin, indexing="xy")
        grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [WW, 2]
        coords = heat @ grid  # [M, 2]
        var = heat @ (grid ** 2) - coords ** 2
        std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10)), axis=-1)
        return jnp.concatenate([coords, std[:, None]], axis=-1)


def fine_loss_l2_std(expec_f: Array, expec_f_gt: Array, pair_mask: Array,
                     correct_thr: float = 1.0) -> Array:
    """l2_with_std loss (fine_matching.py:171-199), masked-mean form."""
    correct = (jnp.max(jnp.abs(expec_f_gt), axis=1) < correct_thr) & pair_mask
    std = expec_f[:, 2]
    inv_std = 1.0 / jnp.clip(std, 1e-10)
    w_all = pair_mask.astype(inv_std.dtype)
    mean_inv = jnp.sum(inv_std * w_all) / jnp.maximum(jnp.sum(w_all), 1.0)
    weight = jax.lax.stop_gradient(inv_std / jnp.maximum(mean_inv, 1e-10))
    offset_l2 = jnp.sum((expec_f_gt - expec_f[:, :2]) ** 2, axis=-1)
    w = correct.astype(offset_l2.dtype) * weight
    return jnp.sum(offset_l2 * w) / jnp.maximum(jnp.sum(correct), 1.0)


def fine_loss_l2(expec_f: Array, expec_f_gt: Array, pair_mask: Array,
                 correct_thr: float = 1.0) -> Array:
    """Plain l2 (fine_matching.py:155-169)."""
    correct = (jnp.max(jnp.abs(expec_f_gt), axis=1) < correct_thr) & pair_mask
    offset_l2 = jnp.sum((expec_f_gt - expec_f[:, :2]) ** 2, axis=-1)
    w = correct.astype(offset_l2.dtype)
    return jnp.sum(offset_l2 * w) / jnp.maximum(jnp.sum(w), 1.0)
