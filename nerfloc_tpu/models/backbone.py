"""2D feature backbone: ResNet50 + FPN, Flax/NHWC.

TPU-native rebuild of the COTR backbone (reference:
nerf_loc/models/COTR/backbone2d.py:67-124 + resnet.py + fpn.py):
  - ResNet50 with frozen batch-norm (affine fold of fixed statistics,
    cf. FrozenBatchNorm2d backbone2d.py:28-64) — stats live in the
    'frozen' collection so they never receive gradients.
  - ImageNet normalization folded in (backbone2d.py:71-73).
  - returns {'conv1' (s2, 64ch), 'layer1' (s4), 'layer2' (s8)}; layer1/layer2
    are FPN-projected to fpn_dim channels (backbone2d.py:101-110, fpn with
    InstanceNorm).

Layout is NHWC throughout (XLA-TPU's preferred conv layout); channel counts
and strides are exposed via layer_to_channels / layer_to_stride exactly like
the reference (backbone2d.py:74-87) so downstream code is layout-agnostic.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class FrozenBatchNorm(nn.Module):
    """y = x * scale + bias with fixed statistics.

    weight/bias/mean/var are stored in the 'frozen' variable collection:
    they are loadable from ported torch checkpoints but excluded from
    optimization (the reference freezes them too, backbone2d.py:28-64).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.variable("frozen", "weight", nn.initializers.ones, None, (self.features,), jnp.float32)
        b = self.variable("frozen", "bias", nn.initializers.zeros, None, (self.features,), jnp.float32)
        rm = self.variable("frozen", "running_mean", nn.initializers.zeros, None, (self.features,), jnp.float32)
        rv = self.variable("frozen", "running_var", nn.initializers.ones, None, (self.features,), jnp.float32)
        eps = 1e-5
        scale = w.value * jax.lax.rsqrt(rv.value + eps)
        bias = b.value - rm.value * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    """torchvision-style ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50Trunk(nn.Module):
    """conv1 + layer1 + layer2 of ResNet50 (all the reference uses:
    return_layers=['conv1','layer1','layer2'], nerf_pose_estimator.py:40-43)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
        x = (x - mean) / std

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        conv1 = x = nn.relu(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i in range(3):  # layer1: 3 blocks, planes 64
            x = Bottleneck(64, stride=1, downsample=(i == 0), dtype=self.dtype,
                           name=f"layer1_{i}")(x)
        layer1 = x
        for i in range(4):  # layer2: 4 blocks, planes 128, stride 2 first
            x = Bottleneck(128, stride=2 if i == 0 else 1, downsample=(i == 0),
                           dtype=self.dtype, name=f"layer2_{i}")(x)
        layer2 = x
        return {"conv1": conv1, "layer1": layer1, "layer2": layer2}


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization (torchvision FPN's
    norm_layer=nn.InstanceNorm2d, backbone2d.py:108; affine=False default)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class FPN(nn.Module):
    """Feature pyramid over {layer1, layer2} with InstanceNorm (fpn.py port)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, Array]) -> Dict[str, Array]:
        names = ["layer1", "layer2"]
        laterals = []
        for n in names:
            lat = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"inner_{n}")(feats[n])
            lat = InstanceNorm(name=f"inner_norm_{n}")(lat)
            laterals.append(lat)
        # top-down: upsample layer2 lateral into layer1 lateral
        results = {}
        top = laterals[-1]
        results["layer2"] = top
        h, w = laterals[0].shape[-3], laterals[0].shape[-2]
        up = jax.image.resize(top, top.shape[:-3] + (h, w, top.shape[-1]), method="nearest")
        results["layer1"] = laterals[0] + up
        for n in names:
            out = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, dtype=self.dtype, name=f"layer_{n}")(results[n])
            results[n] = InstanceNorm(name=f"layer_norm_{n}")(out)
        return results


class Backbone2D(nn.Module):
    """ResNet50 trunk + FPN; the reference Backbone (backbone2d.py:67-124)."""
    fpn_dim: int = 192
    use_fpn: bool = True
    dtype: Any = jnp.float32

    @property
    def layer_to_stride(self) -> Dict[str, int]:
        return {"conv1": 2, "layer1": 4, "layer2": 8}

    @property
    def layer_to_channels(self) -> Dict[str, int]:
        base = {"conv1": 64, "layer1": 256, "layer2": 512}
        if self.use_fpn:
            base.update({"layer1": self.fpn_dim, "layer2": self.fpn_dim})
        return base

    @nn.compact
    def __call__(self, images: Array) -> Dict[str, Array]:
        """images: [B, H, W, 3] in [0, 1] -> dict of NHWC feature maps."""
        feats = ResNet50Trunk(dtype=self.dtype, name="trunk")(images)
        if self.use_fpn:
            fpn_out = FPN(self.fpn_dim, dtype=self.dtype, name="fpn")(feats)
            feats = {**feats, **fpn_out}
        return feats
