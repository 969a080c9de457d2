"""Bilinear feature-map sampling (the torch `grid_sample` replacement).

The reference samples V-view feature maps at projected point locations via
F.grid_sample with align_corners=True (reference: nerf_loc/models/ibrnet/
ibrnet.py:217-222) or align_corners variants in interpolate_feats
(conditional_nerf/neuray_ops.py:14-36). On TPU this becomes four gathers +
a weighted sum; XLA fuses the weighting into the gather consumers.

Feature maps are NHWC (TPU-friendly layout; channels innermost so gathers
move contiguous lanes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bilinear_sample(feat: Array, uv: Array, *, padding_mode: str = "border") -> Array:
    """Sample [H, W, C] features at [..., 2] pixel coords (u, v), u along W.

    Pixel coordinates are in *pixel units* referencing pixel centers, i.e.
    uv=(0,0) reads feat[0,0] exactly — identical to grid_sample with
    align_corners=True after the reference's `2*uv/(size-1)-1` normalization
    (ibrnet.py:139-142).

    padding_mode: 'border' clamps; 'zeros' returns 0 outside [0, W-1]x[0, H-1].
    """
    H, W, C = feat.shape
    shape = uv.shape[:-1]
    uv = uv.reshape(-1, 2)

    if padding_mode == "zeros":
        # four-row-gather path: per-corner out-of-bounds zeroing needs the
        # unclamped corner indices (torch zeros each OOB corner individually,
        # so samples straddling the border still blend the inside corners)
        u, v = uv[..., 0], uv[..., 1]
        u0f = jnp.floor(u)
        v0f = jnp.floor(v)
        du = (u - u0f)[..., None]
        dv = (v - v0f)[..., None]
        u0f = u0f.astype(jnp.int32)
        v0f = v0f.astype(jnp.int32)
        flat = feat.reshape(H * W, C)

        def g(vi, ui):
            idx = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
            val = jnp.take(flat, idx, axis=0)
            inb = ((ui >= 0) & (ui <= W - 1) & (vi >= 0) & (vi <= H - 1))
            return val * inb[..., None].astype(feat.dtype)

        out = (g(v0f, u0f) * (1 - du) * (1 - dv)
               + g(v0f, u0f + 1) * du * (1 - dv)
               + g(v0f + 1, u0f) * (1 - du) * dv
               + g(v0f + 1, u0f + 1) * du * dv)
        return out.reshape(shape + (C,))

    # border mode: torch clamps the *coordinate* to the border before
    # interpolating (grid_sampler clip_coordinates), not just the indices.
    u = jnp.clip(uv[..., 0], 0.0, W - 1)
    v = jnp.clip(uv[..., 1], 0.0, H - 1)

    u0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]

    if C >= 32:
        # one 2x2xC window gather per sample instead of four row gathers:
        # TPU gathers are latency-bound per op, so this is ~25% faster at
        # 1.3M rows. Window start clamped to [0, size-2] keeps du/dv in
        # [0, 1] at the far border (u=W-1 -> u0=W-2, du=1).
        win = jax.vmap(
            lambda vv, uu: jax.lax.dynamic_slice(feat, (vv, uu, 0), (2, 2, C))
        )(v0, u0)  # [N, 2, 2, C]
        top = win[:, 0, 0] * (1 - du) + win[:, 0, 1] * du
        bot = win[:, 1, 0] * (1 - du) + win[:, 1, 1] * du
        out = top * (1 - dv) + bot * dv
    else:
        # small-C maps (rgb, depth): the [N, 2, 2, C] window output gets
        # padded to (8, 128) TPU tiles — a ~40x memory blowup at C=3 that
        # OOMs HBM at scale. Instead pack the four corners into channels
        # ([H, W, 4C], still one lane tile for C<=32) so ONE row gather per
        # sample fetches the whole 2x2 neighborhood — TPU gathers cost per
        # row, and this is 4x fewer rows (35ms -> 9ms at 1.3M rows on v5e).
        # u0/v0 are clamped to size-2, so the roll wraparound rows/cols are
        # never addressed.
        packed = jnp.concatenate([
            feat,
            jnp.roll(feat, -1, axis=1),
            jnp.roll(feat, -1, axis=0),
            jnp.roll(feat, -1, axis=(0, 1)),
        ], axis=-1).reshape(H * W, 4 * C)
        g = jnp.take(packed, v0 * W + u0, axis=0)  # [N, 4C]
        out = (g[:, 0 * C:1 * C] * (1 - du) * (1 - dv)
               + g[:, 1 * C:2 * C] * du * (1 - dv)
               + g[:, 2 * C:3 * C] * (1 - du) * dv
               + g[:, 3 * C:4 * C] * du * dv)
    return out.reshape(shape + (C,))


def pack_bilinear_corners(feats: Array) -> Array:
    """[V, H, W, C] -> flat packed 4-corner table [V*H*W, 4C].

    Row (v*H*W + y*W + x) holds the 2x2 neighborhood at (y, x):
    [feat[y,x] | feat[y,x+1] | feat[y+1,x] | feat[y+1,x+1]]. Built ONCE per
    query frame (SceneContext) so the render hot loop samples all views with
    a single flat row gather — the vmapped per-view gather XLA emits for
    bilinear_sample_views runs ~6x slower than one flat jnp.take at
    [1.3M rows x 896ch] on v5e (66ms -> 11ms). Wraparound rows/cols from the
    rolls are never addressed: sample coords clamp to size-2.
    """
    V, H, W, C = feats.shape
    packed = jnp.concatenate([
        feats,
        jnp.roll(feats, -1, axis=2),
        jnp.roll(feats, -1, axis=1),
        jnp.roll(feats, -1, axis=(1, 2)),
    ], axis=-1)
    return packed.reshape(V * H * W, 4 * C)


def pack_window(feats: Array, offsets) -> Array:
    """[V, H, W, C] -> flat packed window table [V*H*W, len(offsets)*C].

    Row (v*H*W + y*W + x) holds feats[y+dy, x+dx] for each (dx, dy) in
    `offsets`, so an arbitrary fixed window around a pixel costs ONE flat
    row gather (same rationale as pack_bilinear_corners). Wraparound rows
    from the rolls are never addressed when callers clip the window center
    to the valid interior.
    """
    packed = jnp.concatenate(
        [jnp.roll(feats, (-dy, -dx), axis=(1, 2)) for dx, dy in offsets],
        axis=-1)
    V, H, W = feats.shape[:3]
    return packed.reshape(V * H * W, len(offsets) * feats.shape[-1])


def packed_bilinear_sample_views(packed: Array, H: int, W: int,
                                 uv: Array) -> Array:
    """Sample a pack_bilinear_corners table at [V, N, 2] pixel coords.

    Border-mode / align_corners=True semantics identical to
    bilinear_sample(..., padding_mode='border'). Returns [V, N, C].
    """
    V, N = uv.shape[0], uv.shape[1]
    C4 = packed.shape[-1]
    C = C4 // 4
    u = jnp.clip(uv[..., 0], 0.0, W - 1)
    v = jnp.clip(uv[..., 1], 0.0, H - 1)
    u0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    # Sub-pixel weights stay f32 even for bf16 tables: bf16 du/dv quantize
    # to ~2^-9 of a pixel. The f32 blend is elementwise (cheap vs the
    # gather); only the blended output drops back to the table dtype.
    du = (u - u0).reshape(-1, 1).astype(jnp.float32)
    dv = (v - v0).reshape(-1, 1).astype(jnp.float32)
    base = (jnp.arange(V, dtype=jnp.int32) * (H * W))[:, None]
    idx = (base + v0 * W + u0).reshape(-1)
    g = jnp.take(packed, idx, axis=0)                   # [V*N, 4C]
    top = g[:, :C] * (1 - du) + g[:, C:2 * C] * du
    bot = g[:, 2 * C:3 * C] * (1 - du) + g[:, 3 * C:] * du
    out = top * (1 - dv) + bot * dv
    return out.astype(packed.dtype).reshape(V, N, C)


def bilinear_sample_views(feats: Array, uv: Array, *, padding_mode: str = "border") -> Array:
    """vmap of bilinear_sample over a leading view axis.

    Args:
      feats: [V, H, W, C]; uv: [V, ..., 2].
    Returns: [V, ..., C].
    """
    return jax.vmap(lambda f, p: bilinear_sample(f, p, padding_mode=padding_mode))(feats, uv)


def resize_bilinear(img: Array, H: int, W: int) -> Array:
    """[h, w, C] -> [H, W, C] bilinear resize (jax.image; replaces
    F.interpolate in e.g. reference model.py:226-227)."""
    return jax.image.resize(img, (H, W, img.shape[-1]), method="bilinear")


def resize_nearest(img: Array, H: int, W: int) -> Array:
    """Nearest resize, used for depth maps (reference uses F.interpolate
    default 'nearest' on depth, model.py:226)."""
    return jax.image.resize(img, (H, W) + img.shape[2:], method="nearest")
