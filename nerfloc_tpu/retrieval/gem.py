"""AP-GeM / DIR global descriptor (reference's 'dir' retrieval method).

The reference wraps third_party/deep-image-retrieval's Resnet-101-AP-GeM
(reference: nerf_loc/models/image_retrieval/dir.py:34-88 — dirtorch
checkpoint, GeM pooling with exponent gemp=3, optional Landmarks_clean PCA
whitening with whitenp=0.25). Here the same architecture is implemented
directly in flax:

  full ResNet trunk (conv1..layer4, torchvision bottleneck layout, frozen
  BN statistics) -> generalized-mean pool (learnable exponent p) ->
  fc projection -> L2 normalization.

Weights from a dirtorch checkpoint load via `gem_weights.load_dirtorch`
(the checkpoint itself must be fetched out of band — zero egress here),
mirroring how retrieval/netvlad_weights.py ports the hloc NetVLAD .mat.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.backbone import (IMAGENET_MEAN, IMAGENET_STD, Bottleneck,
                               FrozenBatchNorm)

Array = jax.Array

# torchvision bottleneck counts: resnet50 (3,4,6,3), resnet101 (3,4,23,3) —
# the reference's Resnet-101-AP-GeM uses the latter (dir.py:36)
RESNET101_BLOCKS = (3, 4, 23, 3)
RESNET50_BLOCKS = (3, 4, 6, 3)


class FullResNetTrunk(nn.Module):
    """conv1..layer4 of a bottleneck ResNet (NHWC, frozen BN stats).

    The COTR backbone (models/backbone.ResNet50Trunk) stops at layer2
    because matching needs stride-8 features; retrieval pools the stride-32
    layer4 head (dirtorch rnet resnet101 architecture), so this trunk goes
    all the way down. Same naming scheme, so gem_weights' state-dict mapper
    is a superset of tools/port_torch_weights.resnet50_trunk_maps.
    """
    blocks: Tuple[int, ...] = RESNET101_BLOCKS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                             self.blocks)):
            stride0 = 1 if li == 0 else 2
            for i in range(n):
                x = Bottleneck(planes, stride=stride0 if i == 0 else 1,
                               downsample=(i == 0), dtype=self.dtype,
                               name=f"layer{li + 1}_{i}")(x)
        return x                                   # [B, H/32, W/32, 2048]


class GeMDescriptor(nn.Module):
    """images [B, H, W, 3] in [0,1] -> L2-normalized descriptors [B, out_dim].

    dirtorch ResNet_RMAC forward (wrapped by reference dir.py:66-88):
    mean/std preprocessing (dir.py:73-77 uses the checkpoint's stored
    values; ImageNet by default), trunk, GeM pool with learnable p
    (adpool, gemp=3), fc, L2-norm. PCA whitening of the output is a
    host-side post-process (gem_weights.whiten_features), exactly as the
    reference applies it on cpu numpy (dir.py:80-84).
    """
    out_dim: int = 2048
    p_init: float = 3.0
    blocks: Tuple[int, ...] = RESNET101_BLOCKS
    mean: Tuple[float, ...] = IMAGENET_MEAN
    std: Tuple[float, ...] = IMAGENET_STD
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        x = (images - jnp.asarray(self.mean, images.dtype)) \
            / jnp.asarray(self.std, images.dtype)
        x = FullResNetTrunk(blocks=self.blocks, dtype=self.dtype,
                            name="trunk")(x)
        p = self.param("p", nn.initializers.constant(self.p_init), ())
        p = jnp.clip(p, 1.0, 10.0)
        # generalized mean pool: (mean(relu(x)^p))^(1/p); trunk output is
        # post-relu so the clamp only guards the p-th root's gradient
        x = jnp.clip(x.astype(jnp.float32), 1e-6)
        pooled = jnp.mean(x ** p, axis=(1, 2)) ** (1.0 / p)    # [B, C]
        out = nn.Dense(self.out_dim, dtype=jnp.float32, name="whiten")(pooled)
        return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
