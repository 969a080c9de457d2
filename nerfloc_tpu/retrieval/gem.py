"""GeM-pooled global descriptor (the reference's AP-GeM/DIR alternative).

The reference wraps third_party/deep-image-retrieval's AP-GeM models
(reference: nerf_loc/models/image_retrieval/dir.py:34+, submodule-dependent).
Here the architecture is implemented directly: a conv backbone, generalized
mean pooling (learnable exponent p), and a whitening projection with L2
normalization — weight-compatible in structure with Radenovic et al.'s GeM.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.backbone import ResNet50Trunk

Array = jax.Array


class GeMDescriptor(nn.Module):
    """images [B, H, W, 3] in [0,1] -> L2-normalized descriptors [B, out_dim]."""
    out_dim: int = 2048
    p_init: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        feats = ResNet50Trunk(dtype=self.dtype, name="trunk")(images)
        x = feats["layer2"]  # [B, h, w, C]
        p = self.param("p", nn.initializers.constant(self.p_init), ())
        p = jnp.clip(p, 1.0, 10.0)
        # generalized mean pool: (mean(x^p))^(1/p), x clamped positive
        x = jnp.clip(x, 1e-6)
        pooled = jnp.mean(x ** p, axis=(1, 2)) ** (1.0 / p)  # [B, C]
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="whiten")(pooled)
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
