"""Conditional NeRF: generalizable neural field conditioned on support views.

Rebuild of ConditionalNeRF (reference: nerf_loc/models/conditional_nerf/
model.py:29-713) with functional state (SceneContext) and static shapes:

  build_scene_context   <- build_support_neural_points (model.py:144-201)
  query                 <- query (model.py:344-436)
  query_coarse / _fine  <- model.py:277-342
  render_rays           <- model.py:472-600
  sample_keypoints      <- sample_points_3d (model.py:267-275), via Gumbel
                           top-k (== multinomial without replacement)

Dynamic -> static shifts:
  * neural points are dense per-pixel buffers with masks (context.py)
  * KNN is ops.knn (streamed top-k) with the point mask
  * keypoint sampling is fixed-K Gumbel top-k
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...configs import Config
from ...geometry.cameras import get_rays, scale_intrinsics, world_to_camera
from ...geometry.embedder import Embedder
from ...geometry.math import safe_normalize, safe_sqrt
from ...ops.fused_agg import extract_agg_params, fused_neighbor_agg
from ...ops.interp import (pack_bilinear_corners, pack_render_table,
                           packed_bilinear_sample_views,
                           quantize_pack_bilinear_corners, resize_nearest,
                           sample_render_table)
from ...ops.knn import (knn, knn_from_candidate_planes, knn_gather, knn_proj,
                        knn_rays, pack_xyz_window, split_bf16x3,
                        xyz_window_channels)
from ..transformer import MultiHeadAttention
from .aggregator import MultiviewFeatureAggregator, SupportViews
from .context import NeuralPoints, SceneContext
from .projector import project_and_sample
from .neuray import DepthFusionNet, depth2inv_dists
from .projector import compute_angle, compute_projections
from .ray_unet import RayUnet

Array = jax.Array


class MLP(nn.Module):
    """Simple stack of Dense layers with a configurable activation between."""
    features: Tuple[int, ...]
    activation: str = "leaky_relu"
    final_activation: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        acts = {
            "leaky_relu": lambda y: nn.leaky_relu(y, 0.01),
            "relu": nn.relu,
            "elu": nn.elu,
            "sigmoid": nn.sigmoid,
            "softplus": nn.softplus,
            None: lambda y: y,
        }
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.features) - 1:
                x = acts[self.activation](x)
            elif self.final_activation is not None:
                x = acts[self.final_activation](x)
        return x


class ConditionalNeRF(nn.Module):
    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        W = cfg.model_3d_hidden_dim
        self.xyz_embed = Embedder(cfg.multires)            # 63-d for multires=10
        self.view_embed = Embedder(cfg.multires_views)     # 27-d for multires_views=4

        # model.py:36-39
        self.ray_diff_fc = MLP((16, self.view_embed.out_dim), activation="leaky_relu",
                               final_activation="leaky_relu", dtype=self.dtype)

        self.multiview_aggregator = MultiviewFeatureAggregator(
            out_channels=W, dtype=self.dtype)
        self.depth_fusion = DepthFusionNet(dtype=self.dtype)

        # model.py:52-61
        self.confidence_mlp = MLP((64, 1), final_activation="sigmoid", dtype=self.dtype)
        self.keypoint_head = MLP((1,), final_activation="sigmoid", dtype=self.dtype)

        # model.py:63-77. The reference's base_mlp_agg_weight correlation
        # head is omitted: its softmax runs over K identical attention
        # outputs (the query is repeated, model.py:413-414), so it always
        # produces uniform weights that cancel in the normalization — the
        # head receives zero gradient and has no effect on any output.
        self.base_mlp = MLP((W, W, W), final_activation="leaky_relu", dtype=self.dtype)
        self.base_mlp_attn = MultiHeadAttention(4, W, 32, 32, dtype=self.dtype)

        n_total_samples = cfg.render.N_samples + cfg.render.N_importance
        self.ray_unet = RayUnet(W, n_total_samples, dtype=self.dtype)
        self.sigma_mlp = MLP((1,), final_activation="softplus", dtype=self.dtype)
        if cfg.render.render_feature:
            self.feat_mlp = MLP((W, cfg.backbone2d_fpn_dim), dtype=self.dtype)
        self.rgb_blending_mlp = MLP((32, 16, 1), dtype=self.dtype)
        if cfg.render.use_render_uncertainty:
            self.beta_mlp = MLP((1,), final_activation="softplus", dtype=self.dtype)
        self.beta_min = 0.1

        if cfg.use_scene_coord_memorization:  # model.py:115-130
            self.coord_desc_mlp_coarse = MLP((W, W, cfg.matcher_hidden_dim),
                                             activation="relu", dtype=self.dtype)
            self.coord_desc_mlp_fine = MLP((W, W, cfg.matcher_hidden_dim),
                                           activation="relu", dtype=self.dtype)

        self.proj_layer_3d_coarse = nn.Dense(cfg.matcher_hidden_dim, dtype=self.dtype)
        self.proj_layer_3d_fine = nn.Dense(cfg.matcher_hidden_dim, dtype=self.dtype)

    def __call__(self, images: Array, depths: Array, poses: Array, Ks: Array,
                 near: Array, far: Array, feat_coarse_src: Array,
                 feat_fine_src: Array, stride_coarse: int, stride_fine: int,
                 rng: Array):
        """Initialization path: touches every submodule so `init` creates the
        full parameter tree (individual methods only init their own subsets)."""
        ctx = self.build_scene_context(images, depths, poses, Ks, near, far,
                                       feat_coarse_src, feat_fine_src,
                                       stride_coarse, stride_fine)
        desc_c, pts, _ = self.query_coarse(ctx, None, rng)
        desc_f = self.query_fine(ctx, pts[:2])
        rays_o = jnp.broadcast_to(poses[0, :3, 3], (2, 3))
        rays_d = jnp.broadcast_to(poses[0, :3, 2], (2, 3))
        out = self.render_rays(ctx, rays_o, rays_d, poses[0], train=True)
        return desc_c, desc_f, out

    # ------------------------------------------------------------------
    # scene context construction
    # ------------------------------------------------------------------

    def _backproject_level(self, sv: SupportViews, featmaps: Array, stride: int
                           ) -> NeuralPoints:
        """Dense neural points for one level (backproject_support_frame,
        model.py:203-265) — every featmap pixel is a point, mask = depth>0."""
        V, H, Wd = sv.depths.shape
        h, w = H // stride, Wd // stride

        def per_view(img, depth, K, c2w, feat):
            Ks = scale_intrinsics(K, float(stride))
            d = resize_nearest(depth[..., None], h, w)[..., 0]
            im = resize_nearest(img, h, w)
            rays_o, rays_d = get_rays(h, w, Ks, c2w)
            x = (jnp.arange(w, dtype=d.dtype) - Ks[0, 2]) / Ks[0, 0]
            y = (jnp.arange(h, dtype=d.dtype) - Ks[1, 2]) / Ks[1, 1]
            xx, yy = jnp.meshgrid(x, y, indexing="xy")
            pts_cam = jnp.stack([xx * d, yy * d, d], axis=-1)
            pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
            # features live in compute dtype (halves the hot-path gather
            # traffic); geometry (xyz/direction) stays f32 — bf16 offsets of
            # nearby points cancel catastrophically
            desc = jnp.concatenate([im.astype(self.dtype),
                                    feat.astype(self.dtype)], axis=-1)
            direction = jnp.concatenate([rays_d, d[..., None]], axis=-1)
            return (pts_w.reshape(-1, 3), desc.reshape(-1, desc.shape[-1]),
                    direction.reshape(-1, 4), (d > 0).reshape(-1))

        pts_w, desc, direction, mask = jax.vmap(per_view)(
            sv.images, sv.depths, sv.Ks, sv.poses, featmaps)
        P = V * h * w
        pts_w = pts_w.reshape(P, 3)
        desc = desc.reshape(P, -1)
        direction = direction.reshape(P, 4)
        mask = mask.reshape(P)
        # reference frame = first support view (model.py:220,237-238)
        pts_ndc = world_to_camera(sv.poses[0], pts_w)
        return NeuralPoints(xyz=pts_w, xyz_ndc=pts_ndc, feature=desc,
                            confidence=jnp.ones((P, 1), desc.dtype),
                            direction=direction, mask=mask)

    def build_scene_context(self, images: Array, depths: Array, poses: Array,
                            Ks: Array, near: Array, far: Array,
                            feat_coarse_src: Array, feat_fine_src: Array,
                            stride_coarse: int, stride_fine: int,
                            embedding_a: Optional[Array] = None) -> SceneContext:
        """build_support_neural_points (model.py:144-201) + vis featmaps."""
        vis_featmaps = self.depth_fusion(images, depths, Ks, poses, near, far)
        sv = SupportViews(images=images, depths=depths, poses=poses, Ks=Ks,
                          vis_featmaps=vis_featmaps, near=near, far=far)

        coarse = self._backproject_level(sv, feat_coarse_src, stride_coarse)
        fine = self._backproject_level(sv, feat_fine_src, stride_fine)

        # coarse confidence is fixed to 1 (model.py:171); fine confidence via
        # the multiview aggregator (model.py:172-175).
        mv_feat, _, _, _ = self.multiview_aggregator(sv, feat_fine_src,
                                                     fine.xyz)
        conf_f = self.confidence_mlp(mv_feat)
        fine = fine.replace(confidence=conf_f * fine.mask[:, None].astype(conf_f.dtype))

        kp = self.keypoint_head(coarse.feature[:, 3:])  # model.py:178
        coarse = coarse.replace(kp_score=kp)

        # gather tables for the render hot loop. Preferred: ONE merged
        # per-featmap-cell table (ops/interp.pack_render_table) holding
        # [bilinear fused corners | 5x5 xyz candidate window] — one
        # [V*N]-row gather per render chunk instead of two (TPU gathers
        # are row-latency-bound); full-res rgb keeps its own 12-column
        # table (see pack_render_table for why it must not be merged).
        # Fallback (resolution mismatch / non-proj knn_mode): separate
        # 4-corner + knn_proj window tables.
        V = images.shape[0]
        hf, wf = feat_fine_src.shape[1:3]
        res_match = feat_fine_src.shape[1:3] == vis_featmaps.shape[1:3]
        use_merged = (self.cfg.render.use_merged_table and res_match
                      and self.cfg.render.knn_mode == "proj")
        # visibility-pruned render (render.prune_views): feature-only corner
        # table gathered at [N*k] selected rows + the always-built vis table;
        # mutually exclusive with the merged table, supersedes the fused one
        use_pruned = (self.cfg.render.prune_views > 0 and res_match
                      and not use_merged)
        fused_fine_packed = render_table = xyz_window_packed = None
        feat_fine_packed = None
        rgb_packed = pack_bilinear_corners(images.astype(self.dtype))
        if res_match:
            if use_pruned:
                feat_only = feat_fine_src.astype(self.dtype)
                if self.cfg.render.table_dtype == "int8":
                    feat_fine_packed = quantize_pack_bilinear_corners(
                        feat_only, out_dtype=self.dtype)
                else:
                    feat_fine_packed = pack_bilinear_corners(feat_only)
            else:
                fused = jnp.concatenate(
                    [feat_fine_src.astype(self.dtype),
                     vis_featmaps.astype(self.dtype)], axis=-1)
                if use_merged:
                    xyz10 = xyz_window_channels(
                        fine.xyz.reshape(V, hf, wf, 3),
                        fine.mask.reshape(V, hf, wf))
                    render_table = pack_render_table(fused, xyz10)
                elif self.cfg.render.table_dtype == "int8":
                    fused_fine_packed = quantize_pack_bilinear_corners(
                        fused, out_dtype=self.dtype)
                else:
                    fused_fine_packed = pack_bilinear_corners(fused)
        if not use_merged:
            # 3x3-window candidate table for projection-window render KNN
            # (ops/knn.knn_proj): fine points are the stride-s featmap grid
            xyz_window_packed = pack_xyz_window(
                fine.xyz.reshape(V, hf, wf, 3), fine.mask.reshape(V, hf, wf),
                win=self.cfg.render.knn_proj_window)
        # vis-only corner table for the guided coarse pass (tiny: 32ch) and
        # for the pruned path's stage-1 visibility decode
        vis_corner_packed = None
        if self.cfg.render.N_importance > 0 or use_pruned:
            if self.cfg.render.table_dtype == "int8":
                vis_corner_packed = quantize_pack_bilinear_corners(
                    vis_featmaps, out_dtype=self.dtype)
            else:
                vis_corner_packed = pack_bilinear_corners(
                    vis_featmaps.astype(self.dtype))

        return SceneContext(sv=sv, coarse=coarse, fine=fine,
                            feat_coarse_src=feat_coarse_src,
                            feat_fine_src=feat_fine_src,
                            embedding_a=embedding_a,
                            fused_fine_packed=fused_fine_packed,
                            rgb_packed=rgb_packed,
                            vis_corner_packed=vis_corner_packed,
                            xyz_window_packed=xyz_window_packed,
                            render_table=render_table,
                            feat_fine_packed=feat_fine_packed)

    # ------------------------------------------------------------------
    # keypoint sampling
    # ------------------------------------------------------------------

    def sample_keypoints(self, ctx: SceneContext, rng: Array, num: int):
        """sample_points_3d (model.py:267-275): multinomial without
        replacement over keypoint scores == Gumbel top-k on log scores."""
        score = ctx.coarse.kp_score[:, 0]
        logits = jnp.where(ctx.coarse.mask, jnp.log(jnp.clip(score, 1e-12)), -jnp.inf)
        g = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
        _, idx = jax.lax.top_k(logits + g, num)
        # valid points < num: all-(-inf) ties make top_k return arbitrary
        # (masked) indices — substitute the best valid point so the returned
        # set never contains padding (duplicates are harmless downstream)
        best = jnp.argmax(logits)
        idx = jnp.where(ctx.coarse.mask[idx], idx, best)
        return (ctx.coarse.xyz[idx], ctx.coarse.xyz_ndc[idx], idx)

    # ------------------------------------------------------------------
    # querying
    # ------------------------------------------------------------------

    def query(self, ctx: SceneContext, xyz: Array, level: str, K: int,
              direction: Optional[Array] = None,
              knn_idx: Optional[Array] = None,
              proj=None, cand=None, mv_samples=None) -> Dict[str, Array]:
        """Aggregate a descriptor for arbitrary 3D points (model.py:344-436).

        knn_idx: optional precomputed neighbor indices [N, K] (e.g. from the
        ray-coherent ops.knn.knn_rays); distances are recomputed from the
        gathered coordinates so gradients still flow.
        proj: optional precomputed multiview Projection of xyz.
        cand: optional (cand_idx [R, C], local_idx [R, S, K]) from
        knn_rays(return_candidates=True) with R*S == N. Neighbor geometry
        and features are then assembled from per-ray candidate tables with
        one-hot MXU matmuls — a [R*C]-row gather plus matmuls instead of an
        [R*S*K]-row gather (TPU gathers are row-latency-bound, measured
        ~120-190M rows/s on v5e, so S*K/C ~ 4x fewer gather rows wins).
        The one-hot product is exact: f32 path at precision='highest',
        bf16 features selected by bf16 1.0s.
        mv_samples: optional precomputed (rgb [V, N, 3], fused [V, N, Cf])
        multiview samples from the merged render table (render_rays shares
        its single table gather with the aggregator); requires proj.
        """
        cfg = self.cfg
        points = ctx.coarse if level == "coarse" else ctx.fine
        featmaps = ctx.feat_coarse_src if level == "coarse" else ctx.feat_fine_src

        fine_level = level == "fine"
        mv_agg, mv_feat, mv_vis, view_sel = self.multiview_aggregator(
            ctx.sv, featmaps, xyz, proj=proj,
            fused_packed=ctx.fused_fine_packed if fine_level else None,
            rgb_packed=ctx.rgb_packed if fine_level else None,
            render_table=ctx.render_table if fine_level else None,
            samples=mv_samples,
            feat_packed=ctx.feat_fine_packed if fine_level else None,
            vis_packed=ctx.vis_corner_packed if fine_level else None,
            prune_k=cfg.render.prune_views if fine_level else 0)

        if knn_idx is None:
            dists, idx = knn(xyz, points.xyz, K=K, points_mask=points.mask)
            dists = safe_sqrt(dists)
        else:
            idx = knn_idx
            dists = None
        if cand is not None:
            # per-ray candidate-table assembly (see docstring). All in ONE
            # bf16 table + ONE single-pass bf16 matmul: the f32 geometry
            # channels are split into three bf16 components (hi/mid/lo =
            # 24 mantissa bits, reconstructed by an f32 sum after
            # selection) because an f32 one-hot matmul at
            # precision='highest' costs 6 MXU passes (measured +15ms).
            cand_idx, local_idx = cand
            R, C = cand_idx.shape
            SK = local_idx.shape[1] * local_idx.shape[2]
            safe_c = jnp.maximum(cand_idx, 0)
            bf = jnp.bfloat16
            g8 = jnp.concatenate(
                [points.xyz, points.direction,
                 points.confidence.astype(points.xyz.dtype)], axis=-1)
            # bit-masked split: exact under --xla_allow_excess_precision
            # (see ops/knn.split_bf16x3)
            hi, mid, lo = split_bf16x3(g8)
            table = jnp.concatenate(
                [hi, mid, lo, points.mask[:, None].astype(bf),
                 points.feature.astype(bf)], axis=-1)        # [M, 25+F]
            cand_tab = jnp.take(table, safe_c, axis=0)       # [R, C, 25+F]
            oh = (local_idx.reshape(R, SK, 1)
                  == jnp.arange(C, dtype=jnp.int32)[None, None, :])
            nb = jnp.matmul(oh.astype(bf), cand_tab,
                            preferred_element_type=jnp.float32)
            nb = nb.reshape(-1, K, nb.shape[-1])             # [N, K, 25+F]
            gsel = nb[..., :8] + nb[..., 8:16] + nb[..., 16:24]
            nb_xyz = gsel[..., :3]
            nb_dir = gsel[..., 3:7]
            nb_conf = gsel[..., 7:8]
            nb_mask = nb[..., 24]
            nb_feat = nb[..., 25:].astype(points.feature.dtype)
        else:
            # ONE packed gather instead of four: TPU gathers are latency-
            # bound per row, so gathering [xyz|dir|conf|mask|feature]
            # together costs about the same as gathering xyz alone. The
            # table is all-bf16 (f32 rows gather ~8x slower on v5e): the
            # f32 geometry channels ride as three bf16 hi/mid/lo components
            # (split_bf16x3, ~24 mantissa bits after the f32 sum; its
            # custom VJP keeps confidence gradients alive in training) —
            # 440B/row instead of the 816B/row f32 promotion.
            g8 = jnp.concatenate(
                [points.xyz, points.direction,
                 points.confidence.astype(jnp.float32)], axis=-1)
            hi, mid, lo = split_bf16x3(g8)
            bf = jnp.bfloat16
            geo = jnp.concatenate(
                [hi, mid, lo, points.mask[:, None].astype(bf),
                 points.feature.astype(bf)], axis=-1)       # [M, 25+F] bf16
            nbg = knn_gather(geo, idx)                      # [N, K, 25+F]
            gsel = (nbg[..., :8].astype(jnp.float32)
                    + nbg[..., 8:16].astype(jnp.float32)
                    + nbg[..., 16:24].astype(jnp.float32))
            nb_xyz = gsel[..., :3]
            nb_dir = gsel[..., 3:7]
            nb_conf = gsel[..., 7:8]
            nb_mask = nbg[..., 24].astype(jnp.float32)
            nb_feat = nbg[..., 25:].astype(points.feature.dtype)
        if dists is None:
            d2 = jnp.sum((xyz[:, None, :] - nb_xyz) ** 2, axis=-1)
            d2 = jnp.where(nb_mask > 0.5, d2,
                           jnp.finfo(d2.dtype).max / 4)  # masked -> huge, as knn()
            dists = safe_sqrt(d2)

        if direction is None:
            direction = nb_dir[:, 0, :]  # model.py:391-392

        scale = ctx.sv.far - ctx.sv.near
        # The reference repeats the SAME multiview-agg query across all K
        # neighbour slots (model.py:413-414), so every attention output row
        # is identical; the correlation softmax over identical rows is
        # uniform, and the normalized (1/dist * corr * conf) weights then
        # sum to 1 over identical features — i.e. feature_agg is EXACTLY the
        # single-query attention output. Computing it with Lq=1 is an exact
        # 8x reduction of the attention (110ms of the render call on v5e).
        if cfg.render.fused_query_agg and not self.is_initializing():
            # one VMEM-resident Pallas pass for offsets -> embedding ->
            # base_mlp -> Lq=1 attention (ops/fused_agg.py): the XLA graph
            # round-trips ~8 [N*K, W] intermediates through HBM here
            aggp = extract_agg_params(self.variables["params"],
                                      len(self.xyz_embed.freqs),
                                      nb_feat.shape[-1])
            feature_agg = fused_neighbor_agg(
                xyz, direction, mv_agg, nb_xyz, nb_dir,
                nb_feat, scale, aggp, self.xyz_embed.freqs, self.dtype)
            feature = jnp.broadcast_to(feature_agg[:, None, :],
                                       nb_feat.shape[:2] + feature_agg.shape[-1:])
        else:
            xyz_offset = xyz[:, None, :] - nb_xyz
            ray_diff = safe_normalize(direction[:, None, :3] - nb_dir[..., :3])
            ray_dot = jnp.sum(direction[:, None, :3] * nb_dir[..., :3],
                              axis=-1, keepdims=True)
            ray_diff = jnp.concatenate([ray_diff, ray_dot], axis=-1)  # [N, K, 4]

            # sin/cos must be evaluated in f32 — at the highest band the
            # argument is 2^(multires-1) * x, and a bf16 input error there is
            # O(radians). Only the OUTPUT is cast down (it lives in [-1, 1]).
            point_feature = self.base_mlp(jnp.concatenate([
                nb_feat,
                self.xyz_embed(xyz_offset / scale).astype(self.dtype),
                self.ray_diff_fc(ray_diff.astype(self.dtype)),
            ], axis=-1))  # [N, K, W]

            feature1, _ = self.base_mlp_attn(mv_agg[:, None, :], point_feature,
                                             point_feature)  # [N, 1, W]
            feature_agg = feature1[:, 0]
            feature = jnp.broadcast_to(feature1, point_feature.shape)

        weights = (1.0 / jnp.clip(dists, 1e-8)) * nb_conf[..., 0]
        weights = weights / jnp.clip(jnp.sum(weights, axis=1, keepdims=True), 1e-8)

        return {
            "feature_agg": feature_agg,
            "feature": feature,
            "weights": weights,
            "multiview_feature": mv_feat,
            "multiview_visibility": mv_vis,
            "view_sel": view_sel,
        }

    def query_coarse(self, ctx: SceneContext, points: Optional[Array] = None,
                     rng: Optional[Array] = None):
        """model.py:277-312. Returns (desc [N, hidden], pts3d, pts3d_ndc)."""
        if points is None:
            pts3d, pts3d_ndc, sample_idx = self.sample_keypoints(
                ctx, rng, self.cfg.matching.fine_num_3d_keypoints)
            feature_2d = ctx.coarse.feature[sample_idx]
        else:
            pts3d = points
            pts3d_ndc = world_to_camera(ctx.sv.poses[0], points)
            _, idx = knn(points, ctx.coarse.xyz, K=1, points_mask=ctx.coarse.mask)
            feature_2d = knn_gather(ctx.coarse.feature, idx)[:, 0]

        qd = self.query(ctx, pts3d, level="coarse", K=8)
        desc = self.proj_layer_3d_coarse(
            jnp.concatenate([qd["feature_agg"], feature_2d], axis=1))
        if self.cfg.use_scene_coord_memorization:
            desc = desc + self.coord_desc_mlp_coarse(self.xyz_embed(pts3d))
        return desc, pts3d, pts3d_ndc

    def query_fine(self, ctx: SceneContext, points: Array):
        """model.py:314-342."""
        _, idx = knn(points, ctx.fine.xyz, K=1, points_mask=ctx.fine.mask)
        feature_2d = knn_gather(ctx.fine.feature, idx)[:, 0]
        qd = self.query(ctx, points, level="fine", K=1)
        desc = self.proj_layer_3d_fine(
            jnp.concatenate([qd["feature_agg"], feature_2d], axis=1))
        if self.cfg.use_scene_coord_memorization:
            desc = desc + self.coord_desc_mlp_fine(self.xyz_embed(points))
        return desc

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------

    def sample_depths(self, N_samples: int, near, far, dtype=jnp.float32) -> Array:
        """Stratified (deterministic) depths (model.py:451-458)."""
        t = jnp.linspace(0.0, 1.0, N_samples, dtype=dtype)
        if not self.cfg.render.lindisp:
            return near * (1.0 - t) + far * t
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)

    def render_rays(self, ctx: SceneContext, rays_o: Array, rays_d: Array,
                    pose: Array, train: bool = False) -> Dict[str, Array]:
        """Volume-render rays against the conditional field (model.py:472-600).

        rays_o/rays_d: [R, 3]; pose: query c2w [4,4] (for blending angles).
        """
        cfg = self.cfg
        near, far = ctx.sv.near, ctx.sv.far
        N_samples = cfg.render.N_samples
        R = rays_o.shape[0]

        z_vals = jnp.broadcast_to(
            self.sample_depths(N_samples, near, far, rays_o.dtype), (R, N_samples))

        depth_coarse = None
        if cfg.render.N_importance > 0:
            # guide pass at N_guide depths (reference hardcodes 64,
            # model.py:489; see RenderConfig.N_guide)
            ng = cfg.render.N_guide
            z_coarse = jnp.broadcast_to(
                self.sample_depths(ng, near, far, rays_o.dtype), (R, ng))
            que_pts = rays_o[:, None, :] + rays_d[:, None, :] * z_coarse[..., None]
            que_dists = depth2inv_dists(z_coarse, near, far)
            w_coarse = self.multiview_aggregator.predict_alpha_weights(
                ctx.sv, que_pts, z_coarse, que_dists,
                vis_packed=ctx.vis_corner_packed)
            depth_coarse = jnp.sum(w_coarse * z_coarse, axis=-1)
            z_mid = 0.5 * (z_coarse[:, :-1] + z_coarse[:, 1:])
            z_fine = sample_pdf_det(z_mid, jax.lax.stop_gradient(w_coarse[:, 1:-1]),
                                    cfg.render.N_importance)
            z_vals = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)
            N_samples = N_samples + cfg.render.N_importance

        xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        xyz_flat = xyz.reshape(-1, 3)
        dir_flat = jnp.concatenate([
            jnp.broadcast_to(rays_d[:, None, :], (R, N_samples, 3)).reshape(-1, 3),
            z_vals.reshape(-1, 1),
        ], axis=-1)

        # ONE multiview projection of all sample points, shared by the
        # projection-window KNN, the aggregator's sampling pass, and the
        # validity mask below (the reference projects twice,
        # ibrnet.py:169-192 + model.py:563-570)
        Hs, Ws = ctx.sv.images.shape[1:3]
        proj = compute_projections(xyz_flat, ctx.sv.Ks, ctx.sv.poses, Hs, Ws)

        knn_idx = None
        cand = None
        mv_samples = None
        if cfg.render.knn_mode == "proj":
            # projection-window KNN: candidates are the featmap windows
            # around each sample's projections — exact re-rank, 0.99
            # surface recall; see knn_proj docstring for why segment
            # pruning (knn_rays) fails at production cloud density
            hf, wf = ctx.feat_fine_src.shape[1:3]
            stride = Hs // hf
            # in_front only: out-of-bounds projections clip to border
            # pixels, whose points may legitimately be nearest — the exact
            # f32 re-rank keeps or rejects them by true distance
            if ctx.render_table is not None:
                # merged-table path: ONE row gather serves the bilinear
                # fused samples AND the 5x5 KNN candidate window; rgb
                # rides its own cheap 12-col table (pack_render_table
                # docstring explains why it must not be merged)
                Cf = (ctx.feat_fine_src.shape[-1]
                      + ctx.sv.vis_featmaps.shape[-1])
                fused_s, cand_x, cand_y, cand_z, cand_valid, cand_idx = \
                    sample_render_table(ctx.render_table, Cf, Hs, Ws,
                                        hf, wf, proj.uv)
                valid = cand_valid & proj.in_front[:, :, None]
                knn_idx = knn_from_candidate_planes(
                    xyz_flat, cand_x, cand_y, cand_z, valid, cand_idx, 8)
                rgb_s = packed_bilinear_sample_views(
                    ctx.rgb_packed, Hs, Ws, proj.uv)
                mv_samples = (rgb_s, fused_s)
            else:
                knn_idx = knn_proj(xyz_flat, proj.uv / float(stride),
                                   proj.in_front, ctx.xyz_window_packed,
                                   hf, wf, K=8,
                                   win=cfg.render.knn_proj_window)
        elif cfg.render.knn_mode == "ray":
            # ray-coherent KNN: per-ray candidate pruning + exact per-sample
            # refinement — S times less top-k/matmul work than flat KNN over
            # R*S sample points (ops/knn.py knn_rays). CAUTION: candidate
            # recall collapses on production-density clouds; see knn_proj.
            onehot = cfg.render.geo_assembly == "onehot"
            ridx = knn_rays(rays_o, rays_d, z_vals, ctx.fine.xyz, K=8,
                            points_mask=ctx.fine.mask,
                            n_candidates=cfg.render.knn_candidates,
                            selection_dtype=jnp.bfloat16,
                            return_candidates=onehot)
            if onehot:
                ridx, cand_idx, local_idx = ridx
                cand = (cand_idx, local_idx)
            knn_idx = ridx.reshape(R * N_samples, 8)
        qd = self.query(ctx, xyz_flat, level="fine", K=8, direction=dir_flat,
                        knn_idx=knn_idx, proj=proj, cand=cand,
                        mv_samples=mv_samples)
        feature_agg = qd["feature_agg"]
        mv_feat = qd["multiview_feature"]
        mv_vis = qd["multiview_visibility"]

        geo_feat = self.ray_unet(feature_agg.reshape(R, N_samples, -1))
        geo_flat = geo_feat.reshape(R * N_samples, -1)
        sigma = self.sigma_mlp(geo_flat)  # [RN, 1]

        # color blending (model.py:528-538); under visibility pruning the
        # view axis holds each sample's top-k visible views (qd['view_sel'])
        # and ray_diff is selected to match — the softmax below then blends
        # over those k views only
        V = mv_feat.shape[1]
        rgb_in = mv_feat[:, :, :3]
        ray_diff = compute_angle(xyz_flat, pose, ctx.sv.poses).transpose(1, 0, 2)
        if qd.get("view_sel") is not None:
            ray_diff = jnp.take_along_axis(
                ray_diff, qd["view_sel"][..., None], axis=1)
        if self.is_initializing():
            x_rgb = jnp.concatenate([
                jnp.broadcast_to(feature_agg[:, None, :],
                                 (feature_agg.shape[0], V,
                                  feature_agg.shape[1])),
                mv_feat, mv_vis, ray_diff,
            ], axis=-1)
            bw = self.rgb_blending_mlp(x_rgb)
        else:
            # The blending MLP's first layer over concat([feature_agg x V,
            # mv_feat, mv_vis, ray_diff]) is evaluated as per-part matmuls
            # summed into the 32-wide hidden: the [N*V, 360] concat (with a
            # V-fold broadcast copy of feature_agg) is never materialized —
            # ~2 GB of HBM round-trip at render shapes — and the
            # feature_agg partial is computed once per point, not per view.
            # Kernel row slices match the concat order, so numerics and the
            # param tree (checkpoints, goldens) are unchanged.
            p = self.variables["params"]["rgb_blending_mlp"]
            dt = self.dtype
            k0 = p["fc0"]["kernel"].astype(dt)
            Wc = feature_agg.shape[-1]
            Cf = mv_feat.shape[-1]
            k_fa, k_mv, k_vis, k_rd = jnp.split(
                k0, [Wc, Wc + Cf, Wc + Cf + 1], axis=0)
            h = (feature_agg.astype(dt) @ k_fa
                 + p["fc0"]["bias"].astype(dt))[:, None, :]
            h = h + mv_feat.astype(dt) @ k_mv
            h = h + mv_vis.astype(dt) * k_vis[0]
            h = h + ray_diff.astype(dt) @ k_rd
            h = nn.leaky_relu(h, 0.01)
            h = nn.leaky_relu(
                h @ p["fc1"]["kernel"].astype(dt)
                + p["fc1"]["bias"].astype(dt), 0.01)
            bw = (h @ p["fc2"]["kernel"].astype(dt)
                  + p["fc2"]["bias"].astype(dt))
        bw = jnp.where(mv_vis == 0, -1e9, bw)
        bw = jax.nn.softmax(bw, axis=1)
        rgb = jnp.sum(rgb_in * bw, axis=1)  # [RN, 3]

        sigma = sigma.reshape(R, N_samples)
        rgb = rgb.reshape(R, N_samples, 3)
        deltas = z_vals[:, 1:] - z_vals[:, :-1]
        deltas = jnp.concatenate([deltas, 1e2 * jnp.ones_like(deltas[:, :1])], axis=-1)
        alphas = 1.0 - jnp.exp(-deltas * sigma)
        shifted = jnp.concatenate([jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1]],
                                  axis=-1)
        transmittance = jnp.cumprod(shifted, axis=-1)
        weights = alphas * transmittance
        weights_sum = jnp.sum(weights, axis=-1)

        rgb_out = jnp.sum(weights[..., None] * rgb, axis=1)
        if cfg.render.white_bkgd:
            rgb_out = rgb_out + (1.0 - weights_sum[:, None])
        depth = jnp.sum(weights * z_vals, axis=-1)
        depth_unc = jnp.sum(weights * (z_vals - depth[:, None]) ** 2, axis=-1)

        # validity mask (model.py:563-575), from the shared projection
        valid = (proj.in_front & proj.inbound).astype(jnp.float32).T  # [RN, V]
        valid = valid.reshape(R, N_samples, -1).sum(axis=2) > 1
        # the reference requires >8 valid samples per ray at N_samples=64
        # (model.py:571-575); scale the threshold for smaller sample counts
        valid_mask = valid.astype(jnp.float32).sum(axis=1) > min(8, N_samples // 2)

        outputs = {
            "rgb": rgb_out,
            "depth": depth,
            "weights": weights,
            "mask": valid_mask,
            "depth_uncertainty": depth_unc,
        }
        if depth_coarse is not None:
            outputs["depth_coarse"] = depth_coarse

        if train and cfg.render.use_render_uncertainty:
            beta = self.beta_mlp(geo_flat).reshape(R, N_samples)
            outputs["beta"] = jnp.sum(weights * beta, axis=-1) + self.beta_min

        if cfg.render.render_feature:
            feat = self.feat_mlp(feature_agg).reshape(R, N_samples, -1)
            outputs["feat"] = jnp.sum(weights[..., None] * feat, axis=1)

        return outputs

    def render_image(self, ctx: SceneContext, K: Array, pose: Array,
                     H: int, W: int) -> Dict[str, Array]:
        """Full-frame render in ray chunks (reference render_image,
        model.py:602-639: serial python chunk loop -> one lax.map)."""
        rays_o, rays_d = get_rays(H, W, K, pose)
        flat_o = rays_o.reshape(-1, 3)
        flat_d = rays_d.reshape(-1, 3)
        chunk = self.cfg.render.chunk
        n = flat_o.shape[0]
        pad = (-n) % chunk
        if pad:
            flat_o = jnp.concatenate([flat_o, flat_o[:pad]], axis=0)
            flat_d = jnp.concatenate([flat_d, flat_d[:pad]], axis=0)
        o_c = flat_o.reshape(-1, chunk, 3)
        d_c = flat_d.reshape(-1, chunk, 3)
        outs = jax.lax.map(
            lambda od: self.render_rays(ctx, od[0], od[1], pose, train=False),
            (o_c, d_c))
        out = {}
        for k, v in outs.items():
            flat = v.reshape((-1,) + v.shape[2:])[:n]
            out[k] = flat.reshape((H, W) + flat.shape[1:])
        return out

    def query_rgb(self, ctx: SceneContext, xyz: Array) -> Array:
        """Mask-averaged support RGB at points (model.py:438-449)."""
        rgb, _, mask = project_and_sample(xyz, ctx.sv.Ks, ctx.sv.poses,
                                          ctx.sv.images, ctx.feat_fine_src)
        weight = mask / (jnp.sum(mask, axis=1, keepdims=True) + 1e-8)
        return jnp.sum(rgb * weight, axis=1)


def sample_pdf_det(bins: Array, weights: Array, N_importance: int,
                   eps: float = 1e-5) -> Array:
    """Deterministic inverse-CDF sampling (sample_pdf, reference
    conditional_nerf/utils.py:73-112 with det=True).

    bins: [R, M+1] bin EDGES; weights: [R, M] — one fewer, exactly the
    reference contract (its caller passes z_mid[63] with weights[62],
    model.py:487-496). Golden-tested against the torch original in
    tests/test_golden_parity.py.
    """
    R, M = weights.shape
    assert bins.shape[1] == M + 1, (bins.shape, weights.shape)
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R, M+1]

    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N_importance, dtype=bins.dtype),
                         (R, N_importance))
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0)
    above = jnp.clip(inds, max=M)

    cdf_b = jnp.take_along_axis(cdf, below, axis=1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=1)
    bins_b = jnp.take_along_axis(bins, below, axis=1)
    bins_a = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
