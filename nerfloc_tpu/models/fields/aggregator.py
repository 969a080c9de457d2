"""Multi-view feature aggregation with NeuRay occlusion weighting.

Rebuild of MultiviewFeatureAggregator (reference:
nerf_loc/models/conditional_nerf/multiview_aggregator.py:21-222).

Statefulness shift: the reference lazily caches `vis_featmaps` on the module
(:29,41,100-101,178-179); here the caller computes them once per query frame
via DepthFusionNet and passes them in as part of the SceneContext pytree —
explicit dataflow that jit can hoist/reuse.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.interp import (bilinear_sample, bilinear_sample_mm_grad,
                           packed_bilinear_sample_selected,
                           packed_bilinear_sample_views,
                           sample_render_table)
from . import neuray
from .projector import compute_projections, project_and_sample

Array = jax.Array


class SupportViews(NamedTuple):
    """Per-query support set (the reference's topk_* tensors plus the
    precomputed NeuRay ray-feature maps)."""
    images: Array       # [V, H, W, 3]
    depths: Array       # [V, H, W]
    poses: Array        # [V, 4, 4] c2w
    Ks: Array           # [V, 3, 3]
    vis_featmaps: Array  # [V, H/4, W/4, 32]
    near: Array         # scalar
    far: Array          # scalar


def fused_mean_variance(x: Array, weight: Array):
    """Weighted mean/var along the view axis (reference ibrnet.py:8-12)."""
    mean = jnp.sum(x * weight, axis=1, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=1, keepdims=True)
    return mean, var


class MultiviewFeatureAggregator(nn.Module):
    """Projects query points into support views and fuses rgb+feature samples
    with visibility weights decoded from NeuRay ray feats."""
    out_channels: int = 128
    hidden_dim: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.dist_decoder = neuray.MixtureLogisticsDistDecoder(dtype=self.dtype)
        self.out_fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.out_fc2 = nn.Dense(self.out_channels, dtype=self.dtype)

    def _sample_ray_feats(self, sv: SupportViews, xyz: Array,
                          vis_packed: Optional[Array] = None):
        """Project [N,3] points into all views; sample vis featmaps + depths.

        Equivalent of project_points_dict (depth_fusion.py:128-147): validity
        uses the half-open bound (-0.5, size-0.5) (depth_fusion.py:122-123).
        vis_packed: optional pack_bilinear_corners table of sv.vis_featmaps —
        the guided coarse pass samples [V*rn*dn] rows; one flat row gather
        runs ~6x faster than the vmapped per-view gather on v5e.
        """
        V, H, W = sv.images.shape[:3]
        proj = compute_projections(xyz, sv.Ks, sv.poses, H, W)
        u, v = proj.uv[..., 0], proj.uv[..., 1]
        valid = (jnp.abs(proj.depth) >= 1e-4) & (u >= -0.5) & (u < W - 0.5) & \
                (v >= -0.5) & (v < H - 0.5)
        h, w = sv.vis_featmaps.shape[1], sv.vis_featmaps.shape[2]
        scale = jnp.array([(w - 1.0) / (W - 1.0), (h - 1.0) / (H - 1.0)], dtype=xyz.dtype)
        if vis_packed is not None:
            ray_feats = packed_bilinear_sample_views(vis_packed, h, w,
                                                     proj.uv * scale)
        else:
            ray_feats = jax.vmap(lambda fm, uv: bilinear_sample(fm, uv))(
                sv.vis_featmaps, proj.uv * scale)
        ray_feats = ray_feats * valid[..., None].astype(ray_feats.dtype)
        return ray_feats, proj.depth, valid

    def predict_visibility(self, sv: SupportViews, xyz: Array):
        """Per-view visibility of world points (multiview_aggregator.py:63-93).

        Returns (vis [V, N], depth_diff [V, N]).
        """
        ray_feats, prj_depth, valid = self._sample_ray_feats(sv, xyz)
        return self._decode_visibility(sv, ray_feats, prj_depth, valid)

    def _decode_visibility(self, sv: SupportViews, ray_feats: Array,
                           prj_depth: Array, valid: Array):
        mean, var, vis_d, aw = self.dist_decoder(ray_feats)
        ref_depths = neuray.decode_ref_depths(mean, sv.near, sv.far)
        depth_diff = jnp.abs(prj_depth - ref_depths) / (sv.far - sv.near)
        visibility = neuray.compute_visibility(
            prj_depth[..., None], mean, var, vis_d, aw, sv.near, sv.far)
        return visibility * valid.astype(visibility.dtype), depth_diff

    def __call__(self, sv: SupportViews, featmaps: Array, xyz: Array,
                 proj=None, fused_packed: Optional[Array] = None,
                 rgb_packed: Optional[Array] = None,
                 render_table: Optional[Array] = None,
                 samples=None, feat_packed: Optional[Array] = None,
                 vis_packed: Optional[Array] = None, prune_k: int = 0):
        """Aggregate per-point multiview features
        (multiview_aggregator.py:156-222).

        Args: featmaps [V, h, w, C] (backbone features); xyz [N, 3];
          proj: optional precomputed Projection for xyz (the render loop
          computes it once and shares it with the validity mask);
          fused_packed/rgb_packed: optional flat packed 4-corner tables of
          [featmaps|vis_featmaps] and sv.images (SceneContext fields) — the
          render hot loop samples through ONE flat row gather per table
          instead of the ~6x slower vmapped per-view gathers;
          render_table: optional merged render table
          (ops/interp.pack_render_table) — supersedes both packed tables
          with a single row gather;
          samples: optional precomputed (rgb [V, N, 3], fused [V, N, C+32])
          — the render loop's own sample_render_table outputs, shared so
          the table is gathered once per chunk. Requires proj.
          feat_packed/vis_packed + prune_k > 0: visibility-pruned path
          (render.prune_views) — decode visibility for all V from the
          cheap 32-ch vis table, then gather the wide feature/rgb rows for
          each sample's top-k visible views only. Requires proj.
        Returns: (out [N, out_channels], rgb_feat [N, Vk, 3+C],
          vis [N, Vk, 1], view_sel) where Vk = prune_k if pruning else V and
          view_sel is [N, Vk] selected view indices (None when unpruned).
        """
        V, H, W = sv.images.shape[:3]
        C = featmaps.shape[-1]
        if prune_k and feat_packed is not None and proj is not None:
            return self._aggregate_pruned(sv, featmaps, proj, feat_packed,
                                          rgb_packed, vis_packed, prune_k)
        if featmaps.shape[1:3] == sv.vis_featmaps.shape[1:3]:
            # when the backbone level shares the visibility featmaps'
            # resolution (stride-4 'fine' level — the render hot path),
            # sample both in ONE fused pass and split.
            if proj is None:
                if samples is not None:
                    raise ValueError("samples requires the matching proj")
                proj = compute_projections(xyz, sv.Ks, sv.poses, H, W)
            h, w = featmaps.shape[1], featmaps.shape[2]
            scale = jnp.array([(w - 1.0) / (W - 1.0), (h - 1.0) / (H - 1.0)],
                              dtype=xyz.dtype)
            if samples is not None:
                rgb, fused = samples
            elif render_table is not None and rgb_packed is not None:
                fused = sample_render_table(
                    render_table, C + sv.vis_featmaps.shape[-1], H, W,
                    h, w, proj.uv)[0]
                rgb = packed_bilinear_sample_views(rgb_packed, H, W, proj.uv)
            elif fused_packed is not None and rgb_packed is not None:
                rgb = packed_bilinear_sample_views(rgb_packed, H, W, proj.uv)
                fused = packed_bilinear_sample_views(fused_packed, h, w,
                                                     proj.uv * scale)
            else:
                # scene-context build path (no packed tables yet). The
                # sample locations carry no parameter gradient here (xyz is
                # backprojected sensor depth; poses/Ks are data), so the
                # wide fused sampling uses the MXU-transpose VJP: the plain
                # gather's backward is a colliding scatter-add that costs
                # ~409 ms/step at production shapes (BASELINE.md
                # "Train-step budget" bisection). rgb stays on the plain
                # path — at C=3 the dense one-hot contraction wastes the
                # 128-lane MXU and the row scatter is the cheaper transpose.
                rgb = jax.vmap(lambda img, uv: bilinear_sample(img, uv))(
                    sv.images, proj.uv)
                fused_maps = jnp.concatenate([featmaps, sv.vis_featmaps],
                                             axis=-1)
                fused = jax.vmap(bilinear_sample_mm_grad)(
                    fused_maps, jax.lax.stop_gradient(proj.uv * scale))
            feat, ray_feats = fused[..., :C], fused[..., C:]

            u, v = proj.uv[..., 0], proj.uv[..., 1]
            rf_valid = (jnp.abs(proj.depth) >= 1e-4) & (u >= -0.5) & \
                (u < W - 0.5) & (v >= -0.5) & (v < H - 0.5)
            ray_feats = ray_feats * rf_valid[..., None].astype(ray_feats.dtype)
            vis, depth_diff = self._decode_visibility(
                sv, ray_feats, proj.depth, rf_valid)
            rgb = rgb.transpose(1, 0, 2)
            feat = feat.transpose(1, 0, 2)
        else:
            rgb, feat, _ = project_and_sample(xyz, sv.Ks, sv.poses, sv.images,
                                              featmaps)
            vis, depth_diff = self.predict_visibility(sv, xyz)

        rgb_feat = jnp.concatenate([rgb, feat], axis=-1)  # [N, V, 3+C]
        # the visibility decode runs in f32 (projected depths are f32, only
        # [.., 2]-channel math); cast it down to the compute dtype HERE so
        # the wide [N, V, 3+C] mean/var passes below don't get promoted to
        # f32 — that promotion doubles this block's HBM traffic, the render
        # path's second-largest segment (f32 configs are unaffected: the
        # astype is a no-op there)
        vis = vis.T[..., None].astype(rgb_feat.dtype)      # [N, V, 1]
        depth_diff = depth_diff.T[..., None].astype(rgb_feat.dtype)
        out = self._fuse(rgb_feat, vis, depth_diff)
        return out, rgb_feat, vis, None

    def _fuse(self, rgb_feat: Array, vis: Array, depth_diff: Array) -> Array:
        """Visibility-weighted mean/var fusion + the two-layer head
        (multiview_aggregator.py:199-222); view-count agnostic."""
        weight = vis / (jnp.sum(vis, axis=1, keepdims=True) + 1e-8)
        rf_mean, rf_var = fused_mean_variance(rgb_feat, weight)
        dd_mean, dd_var = fused_mean_variance(depth_diff, weight)
        globalfeat = jnp.concatenate([rf_mean, rf_var, dd_mean, dd_var], axis=-1)[:, 0]
        feat_agg = jnp.concatenate([globalfeat, jnp.mean(weight, axis=1)], axis=-1)

        out = nn.elu(self.out_fc1(feat_agg))
        out = nn.elu(self.out_fc2(out))
        return out

    def _aggregate_pruned(self, sv: SupportViews, featmaps: Array, proj,
                          feat_packed, rgb_packed, vis_packed, prune_k: int):
        """Visibility-pruned aggregation (render.prune_views; BASELINE.md
        render roofline, 'fewer views per sample').

        Stage 1 (all V views, cheap): sample the 32-ch vis corner table,
        decode NeuRay visibility. Stage 2 (top-k views per sample): gather
        the wide backbone-feature corners + rgb corners ONLY for the k most
        visible views — [N*k] gather rows instead of [V*N] on the dominant
        table — and fuse over those k. prune_k >= V reproduces the unpruned
        result exactly (top-k then spans all views; the fusion weights and
        blending softmax are permutation-invariant).
        """
        V, H, W = sv.images.shape[:3]
        h, w = featmaps.shape[1], featmaps.shape[2]
        scale = jnp.array([(w - 1.0) / (W - 1.0), (h - 1.0) / (H - 1.0)],
                          dtype=proj.uv.dtype)
        ray_feats = packed_bilinear_sample_views(vis_packed, h, w,
                                                 proj.uv * scale)  # [V,N,32]
        u, v = proj.uv[..., 0], proj.uv[..., 1]
        rf_valid = (jnp.abs(proj.depth) >= 1e-4) & (u >= -0.5) & \
            (u < W - 0.5) & (v >= -0.5) & (v < H - 0.5)
        ray_feats = ray_feats * rf_valid[..., None].astype(ray_feats.dtype)
        vis_all, dd_all = self._decode_visibility(
            sv, ray_feats, proj.depth, rf_valid)       # [V, N] each

        k = min(prune_k, V)
        vis_T = vis_all.T.astype(jnp.float32)           # [N, V]
        _, sel = jax.lax.top_k(vis_T, k)                # [N, k]
        uv_sel = jnp.take_along_axis(proj.uv.transpose(1, 0, 2),
                                     sel[..., None], axis=1)  # [N, k, 2]
        feat = packed_bilinear_sample_selected(feat_packed, h, w,
                                               uv_sel * scale, sel)
        rgb = packed_bilinear_sample_selected(rgb_packed, H, W, uv_sel, sel)
        rgb_feat = jnp.concatenate([rgb, feat], axis=-1)     # [N, k, 3+C]
        vis = jnp.take_along_axis(vis_T, sel, axis=1)[..., None] \
            .astype(rgb_feat.dtype)
        depth_diff = jnp.take_along_axis(dd_all.T.astype(jnp.float32),
                                         sel, axis=1)[..., None] \
            .astype(rgb_feat.dtype)
        out = self._fuse(rgb_feat, vis, depth_diff)
        return out, rgb_feat, vis, sel

    def predict_ref_depths(self, sv: SupportViews) -> Array:
        """Decode per-view depth maps from ray feats at 1/4 res
        (multiview_aggregator.py:39-48). Returns [V, h, w]."""
        V, h, w, C = sv.vis_featmaps.shape
        mean = self.dist_decoder.predict_mean(sv.vis_featmaps.reshape(V, h * w, C))
        return neuray.decode_ref_depths(mean, sv.near, sv.far).reshape(V, h, w)

    def ref_depth_loss(self, sv: SupportViews, depths_gt: Array) -> Array:
        """Supervise decoded ref depths against (clean) sensor depth in
        inverse-normalized space (multiview_aggregator.py:50-61)."""
        pred = self.predict_ref_depths(sv)
        V, h, w = pred.shape
        gt = jax.image.resize(depths_gt, (V, h, w), method="nearest")
        mask = (gt > 0).astype(pred.dtype)
        gt_n = neuray.to_inverse_normalized_depth(gt, sv.near, sv.far)
        pd_n = neuray.to_inverse_normalized_depth(pred, sv.near, sv.far)
        err = (gt_n - pd_n) ** 2 * mask
        return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)

    def predict_alpha_weights(self, sv: SupportViews, que_pts: Array,
                              que_depth: Array, que_dists: Array,
                              alpha_ground_state: float = -15.0,
                              vis_packed: Optional[Array] = None) -> Array:
        """Volume-rendering weights along query rays from NeuRay alphas
        (predict_weights_from_neuray, multiview_aggregator.py:95-154).

        que_pts [rn, dn, 3], que_depth [rn, dn] (sorted), que_dists [rn, dn]
        inverse-normalized intervals. Returns weights [rn, dn].
        vis_packed: see _sample_ray_feats.
        """
        rn, dn, _ = que_pts.shape
        flat = que_pts.reshape(rn * dn, 3)
        ray_feats, prj_depth, valid = self._sample_ray_feats(sv, flat,
                                                             vis_packed)
        mean, var, vis_d, aw = self.dist_decoder(ray_feats)

        V = ray_feats.shape[0]
        prj_depth = prj_depth.reshape(V, rn, dn)
        mean = mean.reshape(V, rn, dn, 2)
        var = var.reshape(V, rn, dn, 2)
        vis_d = vis_d.reshape(V, rn, dn, 1)
        aw = aw.reshape(V, rn, dn, 1)
        interval = jnp.broadcast_to(que_dists[None], (V, rn, dn))

        alpha_logit, visibility, _ = neuray.compute_alpha_prob(
            prj_depth, interval, mean, var, vis_d, aw, sv.near, sv.far)

        m = valid.reshape(V, rn, dn).astype(alpha_logit.dtype)
        alphas = alpha_logit * m + (1.0 - m) * alpha_ground_state
        vis = visibility * m
        alphas = jnp.sum(alphas * vis, axis=0) / jnp.clip(jnp.sum(vis, axis=0), 1e-8)
        invalid_ray = jnp.sum(m, axis=0) == 0
        alphas = jnp.where(invalid_ray, alpha_ground_state, alphas)

        a = jax.nn.sigmoid(alphas)  # [rn, dn]
        shifted = jnp.concatenate([jnp.ones_like(a[:, :1]), 1.0 - a[:, :-1]], axis=-1)
        transmittance = jnp.cumprod(shifted, axis=-1)
        return a * transmittance
