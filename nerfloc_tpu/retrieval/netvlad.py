"""NetVLAD global image descriptor, Flax/NHWC.

Rebuild of the reference NetVLAD (reference: nerf_loc/models/image_retrieval/
netvlad.py:20-157 — VGG16 conv5 backbone + soft-assignment VLAD pooling +
PCA whitening, loaded from MatConvNet weights). Same architecture; weights
can be ported from the MATLAB checkpoint or trained; the retrieval pipeline
also offers an 'oracle' mode that needs no weights.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512)


class VGG16Conv(nn.Module):
    """VGG16 features through conv5_3 (no final pool), ReLU except last
    (the reference strips the last ReLU, netvlad.py:90-92).

    cfg: channel widths / pool markers; overridable so ported checkpoints
    define the widths (tests use scaled-down ones)."""
    cfg: tuple = VGG16_CFG
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv_idx = 0
        n_convs = sum(1 for c in self.cfg if c != "M")
        for c in self.cfg:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{conv_idx}")(x)
                conv_idx += 1
                if conv_idx < n_convs:
                    x = nn.relu(x)
        return x


class NetVLAD(nn.Module):
    """Returns L2-normalized global descriptors [B, out_dim].

    Preprocessing is configurable because the MatConvNet checkpoints operate
    on 0-255 pixels minus the training-set average image (reference
    netvlad.py:126-139 multiplies by 255 then subtracts meta.averageImage);
    from-scratch training uses [0,1] inputs with the ImageNet mean.
    """
    num_clusters: int = 64
    out_dim: int = 4096
    whiten: bool = True
    input_scale: float = 1.0
    pixel_mean: tuple = (0.485, 0.456, 0.406)
    vgg_cfg: tuple = VGG16_CFG
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """images [B, H, W, 3] in [0, 1]."""
        mean = jnp.asarray(self.pixel_mean, dtype=images.dtype)
        x = jnp.clip(images * self.input_scale, 0.0, self.input_scale) - mean
        feat = VGG16Conv(cfg=self.vgg_cfg, dtype=self.dtype, name="backbone")(x)  # [B,h,w,512]
        B, h, w, C = feat.shape
        feat = feat.reshape(B, h * w, C)
        # descriptor-space L2 norm before VLAD (netvlad.py:102)
        feat = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)

        K = self.num_clusters
        # soft assignment: 1x1 conv == dense over channels (netvlad.py:34-38)
        logits = nn.Dense(K, dtype=self.dtype, name="assign")(feat)  # [B,hw,K]
        assign = jax.nn.softmax(logits, axis=-1)
        centers = self.param("centers", nn.initializers.normal(0.02), (K, C))

        # VLAD residual aggregation (netvlad.py:44-55)
        resid = feat[:, :, None, :] - centers[None, None]      # [B,hw,K,C]
        vlad = jnp.sum(resid * assign[..., None], axis=1)      # [B,K,C]
        # intra-normalization then global L2 (netvlad.py:57-60)
        vlad = vlad / (jnp.linalg.norm(vlad, axis=-1, keepdims=True) + 1e-12)
        vlad = vlad.reshape(B, K * C)
        vlad = vlad / (jnp.linalg.norm(vlad, axis=-1, keepdims=True) + 1e-12)

        if self.whiten:
            vlad = nn.Dense(self.out_dim, dtype=self.dtype, name="whiten")(vlad)
            vlad = vlad / (jnp.linalg.norm(vlad, axis=-1, keepdims=True) + 1e-12)
        return vlad
