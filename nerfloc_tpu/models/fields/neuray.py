"""NeuRay-style visibility: depth fusion encoder + mixture-logistics decoder.

Rebuild of:
  - DepthFusionNet + ResEncoder (reference: nerf_loc/models/conditional_nerf/
    depth_fusion.py:239-282, neuray_ops.py:152-239): per-support-view encoder
    of [rgb, normalized inverse depth, cross-view consistency features] ->
    32-channel "ray feats" at 1/4 resolution.
  - MixtureLogisticsDistDecoder (visibility_decoder.py:53-193): decodes ray
    feats into a 2-component logistic mixture over normalized inverse depth;
    gives per-view visibility of arbitrary 3D points and alpha values along
    query rays (used as the coarse sampling PDF).

All depth math operates in inverse-normalized depth
d_norm = (-1/d + 1/near) / (1/near - 1/far) in [0, 1]
(reference losses.py:15-21, visibility_decoder.py:121-128).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geometry.cameras import backproject_depth, camera_project, world_to_camera
from ...ops.interp import bilinear_sample

Array = jax.Array


def to_inverse_normalized_depth(depth: Array, near: Array, far: Array) -> Array:
    """reference losses.py:15-21 (clamped to [0, 1])."""
    near_inv, far_inv = -1.0 / near, -1.0 / far
    d = -1.0 / jnp.clip(depth, 1e-5)
    return jnp.clip((d - near_inv) / (far_inv - near_inv), 0.0, 1.0)


def inverse_normalize_unclamped(depth: Array, near: Array, far: Array) -> Array:
    """Same transform without the [0,1] clamp (visibility_decoder.py:121-128)."""
    near_inv, far_inv = -1.0 / near, -1.0 / far
    d = -1.0 / jnp.clip(depth, 1e-5)
    return (d - near_inv) / (far_inv - near_inv)


def from_inverse_normalized_depth(d_norm: Array, near: Array, far: Array) -> Array:
    """Invert the normalization (decode_ref_depths, visibility_decoder.py:140-148)."""
    near_inv, far_inv = -1.0 / near, -1.0 / far
    d_inv = d_norm * (far_inv - near_inv) + near_inv
    return jnp.clip(-1.0 / d_inv, near, far)


def depth2inv_dists(depth: Array, near: Array, far: Array) -> Array:
    """Per-sample intervals in inverse-normalized space (depth_fusion.py:47-58):
    diffs along the last axis padded with 1e6."""
    d = inverse_normalize_unclamped(depth, near, far)
    dists = d[..., 1:] - d[..., :-1]
    last = jnp.full(d.shape[:-1] + (1,), 1e6, dtype=d.dtype)
    return jnp.concatenate([dists, last], axis=-1)


# ---------------------------------------------------------------------------
# reflect-padded convolution helpers (the reference uses padding_mode='reflect'
# everywhere in the NeuRay encoder, neuray_ops.py:5-12)
# ---------------------------------------------------------------------------

class RConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = (self.kernel - 1) // 2
        hi = self.kernel - 1 - p
        if p or hi:
            x = jnp.pad(x, ((0, 0), (p, hi), (p, hi), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype)(x)


class INorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False) equivalent."""
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * scale + bias


class BasicBlock(nn.Module):
    """ResNet basic block with InstanceNorm + reflect padding
    (neuray_ops.py:88-125)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = RConv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = INorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = RConv(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out)
        out = INorm(self.planes, name="bn2")(out)
        if self.downsample:
            identity = RConv(self.planes, 1, self.stride, dtype=self.dtype, name="ds_conv")(x)
            identity = INorm(self.planes, name="ds_bn")(identity)
        return nn.relu(out + identity)


class ConvIN(nn.Module):
    """conv + InstanceNorm + ELU (neuray_ops.py:127-140)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = RConv(self.features, self.kernel, 1, use_bias=True, dtype=self.dtype, name="conv")(x)
        x = INorm(self.features, name="bn")(x)
        return nn.elu(x)


def _ac_resize_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """[n_out, n_in] bilinear weights for align_corners=True 1-D resize
    (torch F.interpolate(mode='bilinear', align_corners=True) semantics:
    output o samples input at o*(n_in-1)/(n_out-1))."""
    import numpy as np

    W = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        W[:, 0] = 1.0
        return W
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = (pos - i0).astype(np.float32)
    W[np.arange(n_out), i0] = 1.0 - frac
    W[np.arange(n_out), i0 + 1] = frac
    return W


def upsample2x_align_corners(x: Array) -> Array:
    """Exact torch `interpolate(scale_factor=2, mode='bilinear',
    align_corners=True)` on NHWC, as two separable matmuls (the weight
    matrices are trace-time constants, so this rides the MXU instead of a
    gather; reference upconv, neuray_ops.py:142-151)."""
    _, H, W_, _ = x.shape
    mh = jnp.asarray(_ac_resize_matrix(H, 2 * H), x.dtype)
    mw = jnp.asarray(_ac_resize_matrix(W_, 2 * W_), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


def _pad_or_crop_hw(x: Array, th: int, tw: int) -> Array:
    """Zero-pad (centered, extra on the high side) or crop H/W to (th, tw) —
    torch F.pad(x, (dX//2, dX-dX//2, dY//2, dY-dY//2)) with negative pads
    cropping (reference skipconnect, neuray_ops.py:209-221)."""
    dh, dw = th - x.shape[1], tw - x.shape[2]
    if dh == 0 and dw == 0:
        return x
    # per-axis (lo, hi) with Python floor division, exactly like torch: a
    # negative lo/hi crops that side (F.pad semantics for negative pads)
    lo_h, hi_h = dh // 2, dh - dh // 2
    lo_w, hi_w = dw // 2, dw - dw // 2
    x = x[:, max(0, -lo_h):x.shape[1] - max(0, -hi_h),
          max(0, -lo_w):x.shape[2] - max(0, -hi_w)]
    pads = ((0, 0), (max(0, lo_h), max(0, hi_h)),
            (max(0, lo_w), max(0, hi_w)), (0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


class ResEncoder(nn.Module):
    """12-channel input -> 32-channel ray feats at 1/4 res (neuray_ops.py:152-239)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # conv1: 8x8 stride 2, reflect pad 2 (neuray_ops.py:168). With an even
        # kernel the torch output size is floor((H+2*2-8)/2)+1 = H/2 - 1 for
        # even H; we pad (2,2) then VALID to reproduce it.
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
        x = nn.Conv(32, (8, 8), strides=(2, 2), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = INorm(32, name="bn1")(x)
        x = nn.relu(x)

        def layer(x, planes, stride, n, prefix):
            for i in range(n):
                x = BasicBlock(planes, stride=stride if i == 0 else 1,
                               downsample=(i == 0), dtype=self.dtype,
                               name=f"{prefix}_{i}")(x)
            return x

        x1 = layer(x, 32, 2, 2, "layer1")
        x2 = layer(x1, 64, 2, 2, "layer2")
        x3 = layer(x2, 128, 2, 2, "layer3")

        # decoder, reference order (neuray_ops.py:142-151, 209-239): 2x
        # align_corners=True bilinear upsample -> conv+IN+ELU; then
        # skipconnect(x2, x) at neuray_ops.py:230-236 pads the SKIP to the
        # upsampled tensor's size and concats [upsampled, skip] — note the
        # swapped roles: its x1 arg is the skip, its x2 is the upsample.
        def up_block(x, skip, feats, upname):
            x = upsample2x_align_corners(x)
            x = ConvIN(feats, 3, dtype=self.dtype, name=upname)(x)
            skip = _pad_or_crop_hw(skip, x.shape[1], x.shape[2])
            return jnp.concatenate([x, skip], axis=-1)

        u3 = ConvIN(64, 3, dtype=self.dtype, name="iconv3")(up_block(x3, x2, 64, "upconv3"))
        u2 = ConvIN(32, 3, dtype=self.dtype, name="iconv2")(up_block(u3, x1, 32, "upconv2"))
        return nn.Conv(32, (1, 1), dtype=self.dtype, name="out_conv")(u2)


class DepthFusionNet(nn.Module):
    """Support-view 'ray feature' extractor (depth_fusion.py:239-282).

    __call__(images [V,H,W,3], depths [V,H,W], Ks, c2ws, near, far)
      -> [V, H/4, W/4, 32]
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array, depths: Array, Ks: Array, c2ws: Array,
                 near: Array, far: Array) -> Array:
        V, H, W, _ = images.shape
        d_norm = to_inverse_normalized_depth(depths, near, far)[..., None]  # V,H,W,1
        diff = cross_view_diff_feats(images, d_norm[..., 0], Ks, c2ws, near, far)
        feats = ResEncoder(dtype=self.dtype, name="fuse_net")(
            jnp.concatenate([images, d_norm, diff], axis=-1))
        # depth skip: Conv(1->8, k2 s2) + ReLU + Conv(8->16, k2 s2)
        ds = nn.Conv(8, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype,
                     name="depth_skip1")(d_norm)
        ds = nn.relu(ds)
        ds = nn.Conv(16, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype,
                     name="depth_skip2")(ds)
        # spatial sizes can differ by a pixel (conv1's H/2-1); align by resize
        if ds.shape[1:3] != feats.shape[1:3]:
            ds = jax.image.resize(ds, (V, feats.shape[1], feats.shape[2], 16),
                                  method="bilinear")
        return nn.Conv(32, (1, 1), dtype=self.dtype, name="conv_out")(
            jnp.concatenate([ds, feats], axis=-1))


def cross_view_diff_feats(images: Array, d_norm: Array, Ks: Array, c2ws: Array,
                          near: Array, far: Array) -> Array:
    """Cross-view photometric/geometric consistency features
    (get_diff_feats, depth_fusion.py:167-207).

    For every view v: backproject its depth map, project the points into every
    view u, sample (rgb, depth) there, and accumulate masked mean/variance of
    |rgb_u - rgb_v| and normalized inverse-depth disagreement.

    Returns [V, H, W, 8] = rgb_mean(3) + rgb_var(3) + dpt_mean(1) + dpt_var(1).
    """
    V, H, W = d_norm.shape
    depth = from_inverse_normalized_depth(jnp.clip(d_norm, 0.0, 1.0), near, far)

    pts = jax.vmap(lambda d, K, T: backproject_depth(d, K, T)[0])(depth, Ks, c2ws)
    pts_flat = pts.reshape(V * H * W, 3)
    rgb_self = images.reshape(1, V * H * W, 3)

    inv_range = 1.0 / ((-1.0 / far) - (-1.0 / near))

    def source_view(img_u, depth_u, K_u, T_u):
        cam = world_to_camera(T_u, pts_flat)
        u, v, z = camera_project(cam, K_u)
        uv = jnp.stack([u, v], axis=-1)
        valid = (jnp.abs(z) >= 1e-4) & (u >= -0.5) & (u < W - 0.5) & \
                (v >= -0.5) & (v < H - 0.5)
        rgb_s = bilinear_sample(img_u, uv)  # border padding, align_corners=True
        dpt_s = bilinear_sample(depth_u[..., None], uv)[..., 0]
        rgb_diff = jnp.abs(rgb_s - rgb_self[0])
        dpt_diff = jnp.abs(-1.0 / jnp.clip(dpt_s, 1e-5) + 1.0 / jnp.clip(z, 1e-5))
        dpt_diff = jnp.clip(jnp.abs(dpt_diff * inv_range), max=1.5)
        return rgb_diff, dpt_diff, valid.astype(images.dtype)

    # lax.map (not vmap): the per-source-view buffers are [V*H*W, ...]; with
    # a vmapped gather all V source views' sample buffers live at once and
    # blow HBM at V=10 (SURVEY-scale eval uses n_views_test=10)
    rgb_diff, dpt_diff, valid = jax.lax.map(
        lambda args: source_view(*args), (images, depth, Ks, c2ws))
    # masked mean/var over the source-view axis (depth_fusion.py:200-205)
    wsum = jnp.clip(jnp.sum(valid, axis=0), 1e-4)
    rgb_mean = jnp.sum(rgb_diff * valid[..., None], axis=0) / wsum[..., None]
    rgb_var = jnp.sum((rgb_diff - rgb_mean) ** 2 * valid[..., None], axis=0) / wsum[..., None]
    dpt_mean = jnp.sum(dpt_diff * valid, axis=0) / wsum
    dpt_var = jnp.sum((dpt_diff - dpt_mean) ** 2 * valid, axis=0) / wsum

    out = jnp.concatenate(
        [rgb_mean, rgb_var, dpt_mean[..., None], dpt_var[..., None]], axis=-1)
    return out.reshape(V, H, W, 8)


class _DecoderMLP(nn.Module):
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.elu(nn.Dense(32, dtype=self.dtype, name="fc1")(x))
        x = nn.elu(nn.Dense(32, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="fc3")(x)


class MixtureLogisticsDistDecoder(nn.Module):
    """Decode 32-d ray feats -> (mean[2], var[2], vis[1], aw[1])
    (visibility_decoder.py:53-107). var has +0.05 bias after softplus."""
    bias_val: float = 0.05
    dtype: Any = jnp.float32

    def setup(self):
        self.mean_decoder = _DecoderMLP(2, dtype=self.dtype)
        self.var_decoder = _DecoderMLP(2, dtype=self.dtype)
        self.vis_decoder = _DecoderMLP(1, dtype=self.dtype)
        self.aw_decoder = _DecoderMLP(1, dtype=self.dtype)

    def __call__(self, feats: Array):
        if self.is_initializing():
            mean = jax.nn.softplus(self.mean_decoder(feats))
            var = jax.nn.softplus(self.var_decoder(feats)) + self.bias_val
            vis = jax.nn.sigmoid(self.vis_decoder(feats))
            aw = jax.nn.sigmoid(self.aw_decoder(feats))
            return mean, var, vis, aw
        # The four 3-layer decoder MLPs share their input, so run them as ONE
        # block-diagonal MLP: 3 matmuls instead of 12. Skinny [rows, 32]
        # matmuls on TPU are HBM/row-bound, so 4x fewer passes ~ 4x faster
        # here; the zero off-diagonal blocks contribute exactly 0, keeping
        # numerics and the per-decoder param tree (checkpoints, golden
        # parity tests) unchanged.
        p = self.variables["params"]

        def lay(name):
            ks = [p[d][name]["kernel"] for d in
                  ("mean_decoder", "var_decoder", "vis_decoder", "aw_decoder")]
            bs = [p[d][name]["bias"] for d in
                  ("mean_decoder", "var_decoder", "vis_decoder", "aw_decoder")]
            return ks, jnp.concatenate(bs, axis=-1)

        def blockdiag(ks):
            rows = []
            n = len(ks)
            for i, k in enumerate(ks):
                pre = sum(kk.shape[1] for kk in ks[:i])
                post = sum(kk.shape[1] for kk in ks[i + 1:])
                rows.append(jnp.pad(k, ((0, 0), (pre, post))))
            return jnp.concatenate(rows, axis=0)

        k1, b1 = lay("fc1")
        k2, b2 = lay("fc2")
        k3, b3 = lay("fc3")
        dt = self.dtype
        w1 = jnp.concatenate(k1, axis=-1).astype(dt)      # [32, 128]
        w2 = blockdiag(k2).astype(dt)                     # [128, 128]
        w3 = blockdiag(k3).astype(dt)                     # [128, 6]
        x = nn.elu(feats.astype(dt) @ w1 + b1.astype(dt))
        x = nn.elu(x @ w2 + b2.astype(dt))
        out = x @ w3 + b3.astype(dt)
        mean = jax.nn.softplus(out[..., 0:2])
        var = jax.nn.softplus(out[..., 2:4]) + self.bias_val
        vis = jax.nn.sigmoid(out[..., 4:5])
        aw = jax.nn.sigmoid(out[..., 5:6])
        return mean, var, vis, aw

    def predict_mean(self, feats: Array) -> Array:
        return jax.nn.softplus(self.mean_decoder(feats))


def decode_ref_depths(mean: Array, near: Array, far: Array) -> Array:
    """First mixture mean -> metric depth (visibility_decoder.py:140-148)."""
    return from_inverse_normalized_depth(mean[..., 0], near, far)


def compute_visibility(depth: Array, mean: Array, var: Array, vis: Array,
                       aw: Array, near: Array, far: Array) -> Array:
    """P(surface beyond `depth`) per view (visibility_decoder.py:109-138).

    depth [..., 1] metric; mean/var [..., 2]; vis/aw [..., 1].
    Returns [...] visibility in [0, 1].
    """
    d = inverse_normalize_unclamped(depth, near, far)
    mix = jnp.concatenate([aw, 1.0 - aw], axis=-1)
    cdf0 = 0.5 + 0.5 * jnp.tanh((d - mean) * var)
    cdf0 = cdf0 * vis
    return jnp.sum((1.0 - cdf0) * mix, axis=-1)


def compute_alpha_prob(depth: Array, interval: Array, mean: Array, var: Array,
                       vis: Array, aw: Array, near: Array, far: Array,
                       eps: float = 1e-5):
    """Alpha logit + visibility + hit prob along query rays
    (compute_prob with is_ref=True, visibility_decoder.py:150-181 and
    get_near_far_points :6-51 with is_ref=True).

    depth: [..., dn] metric projected depths; interval: [..., dn] inverse-
    normalized sample intervals (broadcastable); mean/var [..., dn, 2];
    vis/aw [..., dn, 1].
    """
    d = inverse_normalize_unclamped(jnp.clip(depth, 1e-5), near, far)
    half = interval / 2.0
    half_ext = jnp.concatenate([half[..., :1], half], axis=-1)
    near_b = d - half_ext[..., :-1]
    far_b = d + half_ext[..., 1:]

    mix = jnp.concatenate([aw, 1.0 - aw], axis=-1)
    d0 = (near_b[..., None] - mean) * var
    d1 = (far_b[..., None] - mean) * var
    cdf0 = (0.5 + 0.5 * jnp.tanh(d0)) * vis
    cdf1 = (0.5 + 0.5 * jnp.tanh(d1)) * vis
    visibility = jnp.sum((1.0 - cdf0) * mix, axis=-1)
    hit_prob = jnp.sum((cdf1 - cdf0) * mix, axis=-1)
    alpha_logit = jnp.log(hit_prob / (visibility - hit_prob + eps) + eps)
    return alpha_logit, visibility, hit_prob
