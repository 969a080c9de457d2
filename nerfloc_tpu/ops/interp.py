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

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class QuantTable:
    """int8-quantized packed gather table (render.table_dtype='int8').

    The render hot loop's packed-table gathers are HBM-bound (BASELINE.md
    roofline: the fused-corner gather streams V*N rows x 4C bf16 cols);
    storing the rows as symmetric per-channel int8 halves the gathered
    bytes. Corner blocks share the unpacked channel's scale, and bilinear
    blending is linear per channel, so dequantization commutes with the
    blend: gather int8 -> blend in f32 -> multiply by scale[c] once.
    """
    q: Array       # [rows, 4*C] int8, pack_bilinear_corners layout
    scale: Array   # [C] f32 per-channel dequant scale (amax/127)
    out_dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)


def quantize_pack_bilinear_corners(feats: Array, out_dtype=jnp.bfloat16,
                                   eps: float = 1e-12) -> QuantTable:
    """[V, H, W, C] -> QuantTable of the pack_bilinear_corners layout.

    Symmetric per-channel quantization: scale[c] = amax_c / 127. Built once
    per localization query (SceneContext), so the reduction over V*H*W rows
    is amortized across every render chunk.

    Inference-only: round/clip has NO straight-through estimator, so a
    training config with table_dtype='int8' would get zero gradients from
    the render loss into feat_fine_src / vis_featmaps (build_context runs
    inside the train step). Keep table_dtype='bf16' for training; see the
    RenderConfig.table_dtype comment for the full precedence rules.
    """
    f32 = feats.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f32), axis=(0, 1, 2))
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(f32 / scale), -127, 127).astype(jnp.int8)
    return QuantTable(pack_bilinear_corners(q), scale, out_dtype)


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


def bilinear_sample_mm_grad(feat: Array, uv: Array,
                            chunk: int = 8192) -> Array:
    """Border-mode bilinear_sample whose FEATURE-MAP gradient runs on the
    MXU instead of TPU scatter-adds.

    The standard transpose of a gather is a scatter-add; with ~V*24k
    sample points hitting a [h, w, C] map, those colliding row scatters
    serialize on TPU and cost ~409 ms of the production train step
    (BASELINE.md "Train-step budget", bisection: `agg_featgrad`). The
    custom backward here instead builds, per chunk of B points, a dense
    [B, h*w] matrix holding each point's four bilinear corner weights
    (a comparison against iota — no scatter anywhere) and contracts it
    with the output cotangent on the MXU with f32 accumulation:
    grad_feat += onehot_w^T @ gy. Chunking bounds the dense matrix at
    ~B*h*w*2 bytes.

    CONTRACT: `uv` receives a ZERO cotangent. Only use where the sample
    locations carry no parameter gradient (the scene-context build:
    xyz is backprojected from sensor depth, poses/Ks are data —
    aggregator.py context path). The forward is numerically identical to
    bilinear_sample(..., padding_mode='border').
    """
    return _bilinear_mm(feat, uv, chunk)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bilinear_mm(feat, uv, chunk):
    return bilinear_sample(feat, uv, padding_mode="border")


def _bilinear_mm_fwd(feat, uv, chunk):
    # feat is saved only for its static shape/dtype (it is alive as the
    # primal input anyway); the backward never reads its values
    return bilinear_sample(feat, uv, padding_mode="border"), (uv, feat)


def _bilinear_mm_bwd(chunk, res, gy):
    uv, feat = res
    H, W, C = feat.shape
    fdt = feat.dtype
    shape = gy.shape[:-1]
    gy = gy.reshape(-1, C)
    uv = uv.reshape(-1, 2)
    N = uv.shape[0]

    # corner indices/weights exactly as the forward computes them
    u = jnp.clip(uv[..., 0], 0.0, W - 1)
    v = jnp.clip(uv[..., 1], 0.0, H - 1)
    u0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    du = (u - u0).astype(gy.dtype)
    dv = (v - v0).astype(gy.dtype)
    base = v0 * W + u0
    idx4 = jnp.stack([base, base + 1, base + W, base + W + 1], -1)  # [N,4]
    w4 = jnp.stack([(1 - du) * (1 - dv), du * (1 - dv),
                    (1 - du) * dv, du * dv], -1)                    # [N,4]

    chunk = min(chunk, -(-N // 128) * 128)  # don't pad tiny N to 8192
    pad = (-N) % chunk
    if pad:
        idx4 = jnp.concatenate([idx4, jnp.zeros((pad, 4), idx4.dtype)])
        w4 = jnp.concatenate([w4, jnp.zeros((pad, 4), w4.dtype)])
        gy = jnp.concatenate([gy, jnp.zeros((pad, C), gy.dtype)])
    nch = idx4.shape[0] // chunk
    idx4 = idx4.reshape(nch, chunk, 4)
    w4 = w4.reshape(nch, chunk, 4)
    gyc = gy.reshape(nch, chunk, C)

    cells = jnp.arange(H * W, dtype=jnp.int32)

    def body(acc, xs):
        idx, w, g = xs
        # [B, HW] = sum over the 4 corners of weight * indicator
        oh = jnp.zeros((chunk, H * W), dtype=g.dtype)
        for k in range(4):
            oh = oh + jnp.where(idx[:, k:k + 1] == cells[None, :],
                                w[:, k:k + 1], 0).astype(g.dtype)
        acc = acc + jax.lax.dot_general(
            oh, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [HW, C]
        return acc, None

    acc0 = jnp.zeros((H * W, C), jnp.float32)
    gfeat, _ = jax.lax.scan(body, acc0, (idx4, w4, gyc))
    return gfeat.reshape(H, W, C).astype(fdt), \
        jnp.zeros(shape + (2,), uv.dtype)


_bilinear_mm.defvjp(_bilinear_mm_fwd, _bilinear_mm_bwd)


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


def packed_bilinear_sample_views(packed, H: int, W: int,
                                 uv: Array) -> Array:
    """Sample a pack_bilinear_corners table at [V, N, 2] pixel coords.

    Border-mode / align_corners=True semantics identical to
    bilinear_sample(..., padding_mode='border'). Returns [V, N, C].
    `packed` may be a plain Array table or a QuantTable (int8 rows +
    per-channel scale) — dequantization happens once, after the blend.
    """
    scale = None
    out_dtype = None
    if isinstance(packed, QuantTable):
        packed, scale, out_dtype = packed.q, packed.scale, packed.out_dtype
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
    if scale is not None:
        g = g.astype(jnp.float32)
    top = g[:, :C] * (1 - du) + g[:, C:2 * C] * du
    bot = g[:, 2 * C:3 * C] * (1 - du) + g[:, 3 * C:] * du
    out = top * (1 - dv) + bot * dv
    if scale is not None:
        return (out * scale[None, :]).astype(out_dtype).reshape(V, N, C)
    return out.astype(packed.dtype).reshape(V, N, C)


def packed_bilinear_sample_selected(packed, H: int, W: int, uv: Array,
                                    view_idx: Array) -> Array:
    """Sample a pack_bilinear_corners table at PER-SAMPLE selected views.

    uv: [N, k, 2] pixel coords; view_idx: [N, k] int32 view of each sample.
    Returns [N, k, C]. The visibility-pruned render path gathers only the
    top-k most visible views per sample — [N*k] rows instead of [V*N] —
    cutting the wide feature gather and everything downstream by k/V
    (BASELINE.md render roofline, 'fewer views per sample' lever).
    Semantics otherwise identical to packed_bilinear_sample_views.
    """
    scale = None
    out_dtype = None
    if isinstance(packed, QuantTable):
        packed, scale, out_dtype = packed.q, packed.scale, packed.out_dtype
    N, k = uv.shape[0], uv.shape[1]
    C = packed.shape[-1] // 4
    u = jnp.clip(uv[..., 0], 0.0, W - 1)
    v = jnp.clip(uv[..., 1], 0.0, H - 1)
    u0 = jnp.clip(jnp.floor(u), 0, W - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, H - 2).astype(jnp.int32)
    du = (u - u0).reshape(-1, 1).astype(jnp.float32)
    dv = (v - v0).reshape(-1, 1).astype(jnp.float32)
    idx = (view_idx * (H * W) + v0 * W + u0).reshape(-1)
    g = jnp.take(packed, idx, axis=0)                   # [N*k, 4C]
    if scale is not None:
        g = g.astype(jnp.float32)
    top = g[:, :C] * (1 - du) + g[:, C:2 * C] * du
    bot = g[:, 2 * C:3 * C] * (1 - du) + g[:, 3 * C:] * du
    out = top * (1 - dv) + bot * dv
    if scale is not None:
        return (out * scale[None, :]).astype(out_dtype).reshape(N, k, C)
    return out.astype(packed.dtype).reshape(N, k, C)


# 5x5 candidate window of the merged render table, relative to the bilinear
# floor cell. The support point grid sits at full-res pixels u = stride*c
# (scale_intrinsics divides K by the stride), so the true nearest-cell
# anchor is n = round(u/stride), while this table's rows are anchored at
# a = floor(u*(wf-1)/(Ws-1)) — the bilinear corner cell. The drift
# d = u/stride - u*(wf-1)/(Ws-1) = u*(stride-1)/(stride*(Ws-1)) lies in
# [0, 1), so n = round(a_frac + d) is in [a, a+2] and the 3x3 window
# around n is always inside offsets [-1..+3] around a: this window is a
# strict superset of knn_proj(win=3)'s candidates at every pixel.
RENDER_WINDOW = tuple((dx, dy) for dy in range(-1, 4) for dx in range(-1, 4))
RENDER_WINDOW_PAD = 2   # ring width covering offset overshoot at the borders
_NW = len(RENDER_WINDOW)          # 25 slots
_WCOLS = _NW * 10                 # 10 channels/slot (xyz hi/mid/lo | mask)


def pack_render_table(fused: Array, xyz10: Array) -> Array:
    """Build the merged per-featmap-cell gather table of the render hot loop.

    TPU gathers are row-latency-bound (~120-190M rows/s on v5e), so the
    per-(sample, view) table gathers of the proj-mode render — bilinear
    4-corner fused features and the knn_proj candidate window — cost a
    gather pass each at the same [V*N]-row count. This table merges them
    into columns of ONE row per featmap cell (padded by a
    RENDER_WINDOW_PAD ring so the fixed window needs no re-clamping):

      [0    : 4*Cf)          bilinear corners of [featmaps | vis]
      [4*Cf : 4*Cf + _WCOLS) 5x5 window of the candidate cells
                             (RENDER_WINDOW), laid out CHANNEL-MAJOR:
                             [x_hi(25) | y_hi | z_hi | x_mid | y_mid |
                              z_mid | x_lo | y_lo | z_lo | mask(25)] so
                             every extraction downstream is a contiguous
                             25-column slice (the offset-major [25, 10]
                             layout forces stride-10 lane relayouts that
                             measured ~2x the whole gather's cost).

    Full-res rgb deliberately stays in its own 12-column table
    (pack_bilinear_corners(images)): appending a 7x7 pixel block here
    widened rows from 1146 to 1293 columns and made the row gather ~4x
    slower on v5e (13.5 -> 50.7 ms at 1.31M rows) — far more than the
    12-column gather it saved.

    Args: fused [V, hf, wf, Cf] (featmaps + vis featmaps, compute dtype);
      xyz10 [V, hf, wf, 10] (ops/knn.xyz_window_channels: split_bf16x3 of
      the fine point grid + mask).
    Returns: [V*(hf+2p)*(wf+2p), 4*Cf + _WCOLS], p = RENDER_WINDOW_PAD.
    Rows are indexed in PADDED cell coords; sample_render_table owns the
    index math. Ring rows are only addressed by window offsets, whose zero
    mask channel marks them invalid.
    """
    V, hf, wf, Cf = fused.shape
    p = RENDER_WINDOW_PAD
    pad2d = lambda x: jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))

    corners = pack_window(pad2d(fused), ((0, 0), (1, 0), (0, 1), (1, 1)))
    window = pack_window(pad2d(xyz10), RENDER_WINDOW)
    # offset-major [slot, channel] -> channel-major [channel, slot]
    window = window.reshape(-1, _NW, 10).transpose(0, 2, 1).reshape(-1, _WCOLS)
    if window.dtype != corners.dtype:
        window = window.astype(corners.dtype)
    return jnp.concatenate([corners, window], axis=-1)


def sample_render_table(table: Array, Cf: int, Hs: int, Ws: int,
                        hf: int, wf: int, uv: Array):
    """ONE row gather per (sample, view) from a pack_render_table.

    Args: uv [V, N, 2] FULL-RES pixel coords (align-corners convention,
      same as bilinear_sample / the reference's grid_sample).
    Returns:
      fused [V, N, Cf] — bilinear featmap sample (table dtype; f32 weights),
      cand_x/cand_y/cand_z [V, N, 25] f32 candidate coordinates per axis
        (kept as separate planes: distances are computed per-component so
        no [V, N, 25, 3] relayout ever materializes),
      cand_valid [V, N, 25] bool (zero-padding ring and masked cells False),
      cand_idx [V, N, 25] int32 flat indices into the ORIGINAL [V*hf*wf]
        point array (clipped at borders; invalid entries carry False mask).
    """
    V, N = uv.shape[0], uv.shape[1]
    p = RENDER_WINDOW_PAD
    hp, wp = hf + 2 * p, wf + 2 * p
    scale_x = (wf - 1.0) / (Ws - 1.0)
    scale_y = (hf - 1.0) / (Hs - 1.0)
    u = jnp.clip(uv[..., 0], 0.0, Ws - 1)
    v = jnp.clip(uv[..., 1], 0.0, Hs - 1)
    uf = u * scale_x
    vf = v * scale_y
    u0 = jnp.clip(jnp.floor(uf), 0, wf - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(vf), 0, hf - 2).astype(jnp.int32)

    base_p = (jnp.arange(V, dtype=jnp.int32) * (hp * wp))[:, None]
    row = (base_p + (v0 + p) * wp + (u0 + p)).reshape(-1)
    g = jnp.take(table, row, axis=0)                    # [V*N, CH]

    # --- bilinear featmap corners (f32 sub-pixel weights; see
    # packed_bilinear_sample_views for why they must not be bf16)
    du = (uf - u0).reshape(-1, 1).astype(jnp.float32)
    dv = (vf - v0).reshape(-1, 1).astype(jnp.float32)
    c = g[:, :4 * Cf]
    top = c[:, :Cf] * (1 - du) + c[:, Cf:2 * Cf] * du
    bot = c[:, 2 * Cf:3 * Cf] * (1 - du) + c[:, 3 * Cf:] * du
    fused = (top * (1 - dv) + bot * dv).astype(table.dtype).reshape(V, N, Cf)

    # --- KNN candidate window: contiguous 25-col channel planes
    def plane(k):
        s = 4 * Cf + k * _NW
        return g[:, s:s + _NW].astype(jnp.float32).reshape(V, N, _NW)

    cand_x = plane(0) + plane(3) + plane(6)   # hi + mid + lo per axis
    cand_y = plane(1) + plane(4) + plane(7)
    cand_z = plane(2) + plane(5) + plane(8)
    cand_valid = plane(9) > 0.5
    dxs = jnp.asarray([o[0] for o in RENDER_WINDOW], jnp.int32)
    dys = jnp.asarray([o[1] for o in RENDER_WINDOW], jnp.int32)
    base_o = (jnp.arange(V, dtype=jnp.int32) * (hf * wf))[:, None, None]
    cy = jnp.clip(v0[:, :, None] + dys, 0, hf - 1)
    cx = jnp.clip(u0[:, :, None] + dxs, 0, wf - 1)
    cand_idx = base_o + cy * wf + cx                    # [V, N, 25]

    return fused, cand_x, cand_y, cand_z, cand_valid, cand_idx


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
