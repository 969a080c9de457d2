"""Appearance embedding + FiLM adaptation.

Rebuild of AppearanceEmbedding / AppearanceAdaptLayer (reference:
nerf_loc/models/appearance_embedding.py:17-67): embedding = per-image
mean||std of conv1 activations (128-d for the 64-channel conv1), adaptation =
a*x + b from an MLP on (target_embedding - source_embedding), with rgb
clipping for the image variant.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def appearance_embedding(conv1_feats: Array) -> Array:
    """[B, H, W, C] conv1 features -> [B, 2C] mean||std embedding
    (appearance_embedding.py:22-36)."""
    mean = jnp.mean(conv1_feats, axis=(1, 2))
    std = jnp.std(conv1_feats, axis=(1, 2), ddof=1)
    return jnp.concatenate([mean, std], axis=-1)


class AppearanceAdaptLayer(nn.Module):
    """FiLM modulation conditioned on the embedding difference
    (appearance_embedding.py:38-67)."""
    input_dim: int
    is_rgb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, embedding: Array, target_embedding: Array) -> Array:
        """x: [B, H, W, C]; embedding: [B, E]; target_embedding: [1, E]."""
        diff = target_embedding - embedding
        h = nn.leaky_relu(nn.Dense(64, dtype=self.dtype, name="fc1")(diff), 0.01)
        h = nn.leaky_relu(nn.Dense(64, dtype=self.dtype, name="fc2")(h), 0.01)
        code = nn.Dense(self.input_dim * 2, dtype=self.dtype, name="fc3")(h)
        a, b = jnp.split(code, 2, axis=-1)
        y = a[:, None, None, :] * x + b[:, None, None, :]
        if self.is_rgb:
            y = jnp.clip(y, 0.0, 1.0)
        return y
