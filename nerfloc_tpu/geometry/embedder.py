"""Positional encodings.

- `nerf_embedder`: the NeRF frequency embedder (reference:
  nerf_loc/models/conditional_nerf/utils.py:5-53). Frequencies 2^0..2^(m-1)
  (log sampling), sin then cos per frequency, optional identity prefix.
- `position_embedding_sine`: the 2D normalized-cumsum sine embedding used for
  coarse 2D descriptors (reference: models/COTR/position_encoding.py:32-80,
  'lin_sine': bases i+1, sin block then cos block).

Both are pure functions of their inputs — no parameters — and are built once
at model-construction time (frequencies are static Python constants so XLA
constant-folds them).
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Embedder:
    """NeRF frequency embedder. out_dim = in_dim * (include_input + 2*num_freqs).

    Output ordering matches the reference (utils.py:26-35): [x (if included),
    sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...].
    """

    def __init__(self, num_freqs: int, include_input: bool = True, input_dims: int = 3,
                 log_sampling: bool = True):
        self.include_input = include_input
        self.input_dims = input_dims
        max_freq = num_freqs - 1
        # plain-Python frequencies: Embedder may be constructed inside a jit
        # trace (flax setup under the train step), where jnp ops would yield
        # tracers that cannot be concretized.
        if num_freqs == 1:
            steps = [0.0]
        else:
            steps = [max_freq * i / (num_freqs - 1) for i in range(num_freqs)]
        if log_sampling:
            self.freqs = tuple(2.0 ** s for s in steps)
        else:
            self.freqs = tuple(1.0 + (2.0 ** max_freq - 1.0) * i / max(num_freqs - 1, 1)
                               for i in range(num_freqs))
        self.out_dim = input_dims * ((1 if include_input else 0) + 2 * len(self.freqs))

    def __call__(self, x: Array) -> Array:
        # Band-vectorized: ONE wide sin and ONE wide cos over [..., F*D]
        # instead of 2F lane-padded [..., D] ops (D=3 wastes 125/128 VPU
        # lanes per op on TPU). The [..., 2, F, D] -> [..., F, 2, D]
        # transpose is a cheap trailing-dim shuffle that restores the
        # reference interleaved ordering [sin(f0 x), cos(f0 x),
        # sin(f1 x), ...] bit-exactly (utils.py:26-35).
        D = x.shape[-1]
        F = len(self.freqs)
        f = jnp.asarray(self.freqs, dtype=x.dtype)
        xb = (x[..., None, :] * f[:, None]).reshape(x.shape[:-1] + (F * D,))
        sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)   # [..., 2, F*D]
        sc = sc.reshape(x.shape[:-1] + (2, F, D))
        sc = jnp.swapaxes(sc, -3, -2).reshape(x.shape[:-1] + (2 * F * D,))
        parts = [x] if self.include_input else []
        parts.append(sc)
        return jnp.concatenate(parts, axis=-1)


def nerf_embedder(multires: int, i_embed: int = 0, include_input: bool = True
                  ) -> Tuple[Callable[[Array], Array], int]:
    """Reference get_embedder (utils.py:38-53): returns (fn, out_dim)."""
    if i_embed == -1:
        return (lambda x: x), 3
    emb = Embedder(num_freqs=multires, include_input=include_input)
    return emb, emb.out_dim


def _lin_sine(x: Array, depth: int) -> Array:
    """NerfPositionalEncoding with lin_sine bases (position_encoding.py:32-50):
    concat over i in 1..depth of sin(i*pi*x), then cos(i*pi*x)."""
    sins = [jnp.sin(i * math.pi * x) for i in range(1, depth + 1)]
    coss = [jnp.cos(i * math.pi * x) for i in range(1, depth + 1)]
    return jnp.concatenate(sins + coss, axis=-1)


def position_embedding_sine(H: int, W: int, num_pos_feats: int, dtype=jnp.float32) -> Array:
    """[H, W, C] sine position embedding over a feature grid.

    Matches PositionEmbeddingSine.forward (position_encoding.py:65-80):
    normalized (cumsum-0.5)/total coordinates -> lin_sine of depth
    num_pos_feats//2 over the 2-vector (x, y); C = 2 * 2 * depth.
    """
    y = (jnp.arange(H, dtype=dtype) + 0.5) / (H + 1e-6)
    x = (jnp.arange(W, dtype=dtype) + 0.5) / (W + 1e-6)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    pos = jnp.stack([xx, yy], axis=-1)  # [H, W, 2]
    return _lin_sine(pos, num_pos_feats // 2)


def pos_encoding_3d(pts_ndc: Array, hidden_dim: int) -> Array:
    """3D keypoint positional embedding: frequency embedder without identity,
    dims matched to the matcher hidden size (reference nerf_pose_estimator.py:68:
    get_embedder(hidden_dim//6, 0, include_input=False))."""
    emb = Embedder(num_freqs=hidden_dim // 6, include_input=False)
    return emb(pts_ndc)
