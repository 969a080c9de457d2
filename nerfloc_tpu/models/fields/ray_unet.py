"""1-D U-Net over the samples-per-ray axis.

Rebuild of RayUnet (reference: nerf_loc/models/conditional_nerf/ray_unet.py:
5-69): Conv1d(3) + LayerNorm([C, S]) + ELU, 3 maxpool-down / 3 transpose-up
levels, skip connections, final conv on [input, up] concat. Layout here is
[R, S, C] (length axis second; channels innermost for TPU).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class LayerNormSC(nn.Module):
    """torch LayerNorm([C, S]): normalize each ray over (samples, channels)
    with a per-(S, C) affine."""
    samples: int
    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [R, S, C]
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.var(x, axis=(-2, -1), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (self.samples, self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.samples, self.channels))
        return y * scale + bias


class Conv1dMM(nn.Module):
    """k=3 'SAME' Conv1d as an explicit im2col matmul.

    Numerically and parameter-identical to nn.Conv(features, (3,),
    padding='SAME') — kernel [3, Cin, Cout], bias [Cout] — but lowered as
    ONE [R*S, 3Cin] x [3Cin, Cout] MXU matmul: XLA's native conv pick for
    these skinny shapes runs 10x slower (41ms vs 4ms for 128->64 over
    [4096, 64] rays x samples on v5e).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [R, S, C]
        C = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        shifted = jnp.concatenate([
            jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1],   # x[i-1]
            x,
            jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:],    # x[i+1]
        ], axis=-1).astype(self.dtype)
        w = kernel.reshape(3 * C, self.features).astype(self.dtype)
        return shifted @ w + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    features: int
    samples: int
    transpose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.transpose:
            # padding (1, 2) reproduces torch ConvTranspose1d(3, stride=2,
            # padding=1, output_padding=1) exactly (reference ray_unet.py:
            # 31-44); flax 'SAME' is offset by one sample (verified in
            # tests/test_golden_parity.py)
            x = nn.ConvTranspose(self.features, (3,), strides=(2,),
                                 padding=((1, 2),),
                                 dtype=self.dtype, name="conv")(x)
        else:
            x = Conv1dMM(self.features, dtype=self.dtype, name="conv")(x)
        x = LayerNormSC(self.samples, self.features, name="ln")(x)
        return nn.elu(x)


class RayUnet(nn.Module):
    in_channels: int
    n_samples: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: [R, S, C] -> [R, S, C]."""
        S = self.n_samples
        assert x.shape[1] == S, f"RayUnet built for S={S}, got {x.shape[1]}"

        def pool(h):
            return nn.max_pool(h, (2,), strides=(2,))

        c1 = ConvBlock(64, S, name="conv1", dtype=self.dtype)(x)
        p1 = pool(c1)
        c2 = ConvBlock(128, S // 2, name="conv2", dtype=self.dtype)(p1)
        p2 = pool(c2)
        c3 = ConvBlock(128, S // 4, name="conv3", dtype=self.dtype)(p2)
        p3 = pool(c3)

        u3 = ConvBlock(128, S // 4, transpose=True, name="trans_conv3", dtype=self.dtype)(p3)
        u2 = ConvBlock(64, S // 2, transpose=True, name="trans_conv2",
                       dtype=self.dtype)(jnp.concatenate([p2, u3], axis=-1))
        u1 = ConvBlock(32, S, transpose=True, name="trans_conv1",
                       dtype=self.dtype)(jnp.concatenate([p1, u2], axis=-1))
        out = ConvBlock(self.in_channels, S, name="conv_out",
                        dtype=self.dtype)(jnp.concatenate([x, u1], axis=-1))
        return out
