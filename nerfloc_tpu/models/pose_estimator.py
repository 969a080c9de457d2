"""Top-level localization model.

Rebuild of NerfPoseEstimator (reference: nerf_loc/models/nerf_pose_estimator.py:
33-583): 2D backbone -> appearance adaptation -> conditional-NeRF 3D
descriptors -> coarse/fine matching -> (eval) on-device PnP-RANSAC.

Structural shifts from the reference:
  * batch=1 assert (reference :240-241) becomes an unbatched query processed
    by pure functions; data parallelism is applied outside via shard_map.
  * all matching buffers are fixed-size with masks (pairs [N] + mask instead
    of variable i_ids/j_ids).
  * PnP runs on-device (solve/pnp.py) instead of pycolmap on CPU (:557-583).
  * the zero-positive-pair resampling fallback (:430-456) is unnecessary:
    masked losses degrade gracefully and there is no DDP graph-divergence
    hazard under SPMD.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import Config
from ..geometry.cameras import camera_project, rays_for_pixels, world_to_camera
from ..geometry.embedder import Embedder, position_embedding_sine
from ..ops.interp import bilinear_sample
from ..solve.pnp import ransac_pnp
from .appearance import AppearanceAdaptLayer, appearance_embedding
from .backbone import Backbone2D
from .fields.conditional_nerf import ConditionalNeRF
from .fields.conditional_nerf_simple import ConditionalNeRFSimple
from .fields.context import SceneContext
from .fields.losses import img2mse, mse2psnr, rendering_loss
from .matching import (
    FineMatching,
    FinePreprocess,
    S2DMatching,
    coarse_loss,
    fine_loss_l2,
    fine_loss_l2_std,
    gather_windows,
    mutual_nearest_matches,
)
from .transformer import SelfCrossTransformer

Array = jax.Array


def select_visible_mask(pts3d: Array, pose_c2w: Array, K: Array,
                        H: int, W: int) -> Array:
    """[N] bool: keypoints that project inside the frame from a pose
    (static-mask form of select_3d_keypoints, reference
    nerf_pose_estimator.py:178-190)."""
    pts_cam = world_to_camera(pose_c2w, pts3d)
    u, v, z = camera_project(pts_cam, K)
    return (u >= 0) & (v >= 0) & (u < W) & (v < H) & (z > 0)


class NerfPoseEstimator(nn.Module):
    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        hd = cfg.matcher_hidden_dim
        self.backbone2d = Backbone2D(fpn_dim=cfg.backbone2d_fpn_dim,
                                     use_fpn=cfg.backbone2d_use_fpn, dtype=self.dtype)
        self.proj_layer_2d = nn.Dense(hd, dtype=self.dtype)
        self.pos_emd_3d = Embedder(hd // 6, include_input=False)

        self.coarse_transformer = SelfCrossTransformer(
            d_model=hd, nhead=8, dim_feedforward=512, dtype=self.dtype)
        self.coarse_matcher = S2DMatching(thr=cfg.matching.thr, dtype=self.dtype)

        self.fine_preprocess = FinePreprocess(out_channels=hd, dtype=self.dtype)
        self.fine_transformer = SelfCrossTransformer(
            d_model=hd, nhead=8, dim_feedforward=128, dtype=self.dtype)
        self.fine_matcher = FineMatching(dtype=self.dtype)

        if cfg.cascade_matching:
            # second matcher for the cascade pass over pose-visible keypoints
            # (reference self.matcher_fine, nerf_pose_estimator.py:330-349)
            self.coarse_transformer2 = SelfCrossTransformer(
                d_model=hd, nhead=8, dim_feedforward=512, dtype=self.dtype)
            self.coarse_matcher2 = S2DMatching(thr=cfg.matching.thr,
                                               dtype=self.dtype)
            self.fine_preprocess2 = FinePreprocess(out_channels=hd,
                                                   dtype=self.dtype)
            self.fine_transformer2 = SelfCrossTransformer(
                d_model=hd, nhead=8, dim_feedforward=128, dtype=self.dtype)
            self.fine_matcher2 = FineMatching(dtype=self.dtype)

        if cfg.simple_3d_model:
            # ablation: projection-average conditioning (reference
            # model_simple.py, selected by args.simple_3d_model)
            self.model_3d = ConditionalNeRFSimple(cfg, dtype=self.dtype)
        else:
            self.model_3d = ConditionalNeRF(cfg, dtype=self.dtype)

        if cfg.encode_appearance:
            self.adapt_appearance_coarse = AppearanceAdaptLayer(
                cfg.backbone2d_fpn_dim, dtype=self.dtype)
            self.adapt_appearance_fine = AppearanceAdaptLayer(
                cfg.backbone2d_fpn_dim, dtype=self.dtype)
            if cfg.train_nerf:
                self.adapt_appearance_rgb = AppearanceAdaptLayer(
                    3, is_rgb=True, dtype=self.dtype)

    # ------------------------------------------------------------------
    # 2D features
    # ------------------------------------------------------------------

    def extract_2d(self, imgs: Array) -> Dict[str, Array]:
        """[B, H, W, 3] -> feature dict (reference :94-124)."""
        cfg = self.cfg
        pyr = self.backbone2d(imgs)
        feat_coarse = pyr[cfg.backbone2d_coarse_layer_name]
        feat_fine = pyr[cfg.backbone2d_fine_layer_name]
        return {
            "feat_pyramid": pyr,
            "feat_coarse": feat_coarse,
            "feat_fine": feat_fine,
            "stride_coarse": self.backbone2d.layer_to_stride[cfg.backbone2d_coarse_layer_name],
            "stride_fine": self.backbone2d.layer_to_stride[cfg.backbone2d_fine_layer_name],
        }

    @staticmethod
    def _slice_2d(a2d: Dict[str, Array], lo: int, hi) -> Dict[str, Array]:
        """Slice a batched extract_2d result along the image axis (strides
        stay python ints)."""
        return {
            "feat_pyramid": {k: v[lo:hi]
                             for k, v in a2d["feat_pyramid"].items()},
            "feat_coarse": a2d["feat_coarse"][lo:hi],
            "feat_fine": a2d["feat_fine"][lo:hi],
            "stride_coarse": a2d["stride_coarse"],
            "stride_fine": a2d["stride_fine"],
        }

    # ------------------------------------------------------------------
    # scene context (support set -> neural points)
    # ------------------------------------------------------------------

    def build_context(self, batch: Dict[str, Array]) -> Tuple[SceneContext, Dict[str, Array]]:
        """Backbone on query+support, appearance adaptation (reference
        :218-237), then conditional-NeRF scene context."""
        cfg = self.cfg
        if batch["image"].shape == batch["topk_images"].shape[1:]:
            # one batched backbone pass over [1+V] images instead of two
            # sequential [1]- and [V]-image chains: per-image conv results
            # are independent (frozen BN uses running stats), so this is
            # numerically identical, but the backbone at 240x320-class
            # shapes is latency-bound (BASELINE.md "Localization-query
            # budget") and one chain costs nearly half of two
            a2d = self.extract_2d(jnp.concatenate(
                [batch["image"][None], batch["topk_images"]], axis=0))
            q2d = self._slice_2d(a2d, 0, 1)
            s2d = self._slice_2d(a2d, 1, None)
        else:
            q2d = self.extract_2d(batch["image"][None])
            s2d = self.extract_2d(batch["topk_images"])

        feat_coarse_src = s2d["feat_coarse"]
        feat_fine_src = s2d["feat_fine"]
        topk_images = batch["topk_images"]
        embedding_a = None
        if cfg.encode_appearance:
            embedding_a = appearance_embedding(q2d["feat_pyramid"]["conv1"])  # [1, 128]
            embedding_src = appearance_embedding(s2d["feat_pyramid"]["conv1"])  # [V, 128]
            if cfg.train_nerf:
                topk_images = self.adapt_appearance_rgb(
                    topk_images, embedding_src, embedding_a)
            feat_coarse_src = self.adapt_appearance_coarse(
                feat_coarse_src, embedding_src, embedding_a)
            feat_fine_src = self.adapt_appearance_fine(
                feat_fine_src, embedding_src, embedding_a)

        ctx = self.model_3d.build_scene_context(
            topk_images, batch["topk_depths"], batch["topk_poses"], batch["topk_Ks"],
            batch["near"], batch["far"], feat_coarse_src, feat_fine_src,
            q2d["stride_coarse"], q2d["stride_fine"], embedding_a)
        return ctx, q2d

    # ------------------------------------------------------------------
    # 3D-2D supervision pairs (reference :126-175)
    # ------------------------------------------------------------------

    def build_3d_2d_pairs(self, pts3d: Array, depth_map: Array, K: Array,
                          pose: Array, H: int, W: int, stride: int,
                          thr: float):
        """Project 3D keypoints with the GT pose; depth-check against the
        query depth map. Returns static-shape (j_gt [N], gt_mask [N],
        proj_fine [N, 2] at coarse scale)."""
        pts_cam = world_to_camera(pose, pts3d)
        u, v, z = camera_project(pts_cam, K)
        proj_valid = (u >= 0) & (v >= 0) & (u < W) & (v < H) & (z > 0)
        ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
        d = depth_map[vi, ui]
        depth_ok = jnp.abs(d - z) < thr
        pos_mask = proj_valid & depth_ok
        # reference :159-160 — if almost no pair survives the depth check,
        # fall back to projection-validity only
        pos_mask = jnp.where(jnp.sum(pos_mask) < 4, proj_valid, pos_mask)

        cell_x = jnp.clip((u / stride).astype(jnp.int32), 0, W // stride - 1)
        cell_y = jnp.clip((v / stride).astype(jnp.int32), 0, H // stride - 1)
        j_gt = cell_x + cell_y * (W // stride)
        proj_coarse = jnp.stack([u, v], axis=-1) / stride
        return j_gt, pos_mask, proj_coarse

    # ------------------------------------------------------------------
    # matching (reference matcher.py:63-131 + estimate :408-555)
    # ------------------------------------------------------------------

    def match(self, ctx: SceneContext, q2d: Dict[str, Array],
              batch: Dict[str, Array], desc_3d: Array, pts3d: Array,
              pts3d_ndc: Array, train: bool,
              j_gt: Optional[Array] = None, gt_mask: Optional[Array] = None,
              proj_gt_coarse: Optional[Array] = None,
              kp_mask: Optional[Array] = None,
              second: bool = False) -> Dict[str, Array]:
        """One coarse->fine matching pass.

        kp_mask: optional [N] bool — keypoints excluded from matching (the
        cascade pass masks pose-invisible points instead of the reference's
        dynamic index_select, nerf_pose_estimator.py:335-344).
        second: use the cascade matcher's parameters.
        """
        cfg = self.cfg
        H, W = batch["image"].shape[0], batch["image"].shape[1]
        sc, sf = q2d["stride_coarse"], q2d["stride_fine"]
        hc, wc = H // sc, W // sc

        if second:
            coarse_tf, coarse_m = self.coarse_transformer2, self.coarse_matcher2
            fine_pre, fine_tf = self.fine_preprocess2, self.fine_transformer2
            fine_m = self.fine_matcher2
        else:
            coarse_tf, coarse_m = self.coarse_transformer, self.coarse_matcher
            fine_pre, fine_tf = self.fine_preprocess, self.fine_transformer
            fine_m = self.fine_matcher

        feat_coarse = q2d["feat_coarse"][0]           # [hc, wc, C]
        desc_2d = self.proj_layer_2d(feat_coarse.reshape(hc * wc, -1))
        pos_2d = position_embedding_sine(hc, wc, cfg.matcher_hidden_dim // 2,
                                         dtype=desc_2d.dtype).reshape(hc * wc, -1)
        pos_3d = self.pos_emd_3d(pts3d_ndc)

        d3, d2 = coarse_tf(desc_3d[None], pos_3d[None],
                           desc_2d[None], pos_2d[None])
        conf = coarse_m(d3[0], d2[0])                 # [N, M] logits
        if kp_mask is not None:
            conf = jnp.where(kp_mask[:, None], conf, -1e9)
        scores = jax.nn.sigmoid(conf)
        match_j, match_mask = mutual_nearest_matches(scores, cfg.matching.thr)
        if kp_mask is not None:
            match_mask = match_mask & kp_mask

        out: Dict[str, Array] = {
            "score_matrix": scores,
            "match_j": match_j,
            "match_mask": match_mask,
        }

        # fine stage operates on GT pairs in training (matcher.py:87-99),
        # predicted pairs at eval
        if train:
            j_fine = j_gt
            pair_mask = gt_mask
        else:
            j_fine = match_j
            pair_mask = match_mask

        wsz = cfg.matching.fine_window_size
        ratio = sc // sf
        cell_x = (j_fine % wc) * ratio
        cell_y = (j_fine // wc) * ratio
        centers = jnp.stack([cell_x, cell_y], axis=-1)  # [N, 2] fine-scale px

        desc_3d_fine = self.model_3d.query_fine(ctx, pts3d)
        feat_fine = q2d["feat_fine"][0]               # [hf, wf, Cf]
        patches, _ = gather_windows(feat_fine, centers, wsz)
        patches = fine_pre(patches)                   # [N, ww, hd]

        pos_win = position_embedding_sine(wsz, wsz, cfg.matcher_hidden_dim // 2,
                                          dtype=patches.dtype).reshape(1, wsz * wsz, -1)
        pos_win = jnp.broadcast_to(pos_win, patches.shape[:1] + pos_win.shape[1:])
        f3, f2 = fine_tf(
            desc_3d_fine[:, None, :], pos_3d[:, None, :], patches, pos_win)
        expec_f = fine_m(f3[:, 0, :], f2)             # [N, 3]

        mkps2d_c = centers.astype(expec_f.dtype)
        mkps2d_f = mkps2d_c + expec_f[:, :2] * (wsz // 2)  # fine-scale px
        out.update({
            "expec_f": expec_f,
            "mkps2d_f": mkps2d_f * sf,   # input scale (estimate :509)
            "mkps3d": pts3d,
            "pair_mask": pair_mask,
        })

        if train:
            if kp_mask is not None:
                gt_mask = gt_mask & kp_mask
            conf_gt = jnp.zeros_like(conf)
            rows = jnp.arange(conf.shape[0])
            conf_gt = conf_gt.at[rows, j_gt].set(gt_mask.astype(conf.dtype))
            out["coarse_loss"] = coarse_loss(conf, conf_gt)
            expec_f_gt = (proj_gt_coarse * ratio - mkps2d_c) / (wsz // 2)
            if cfg.fine_matching_loss_type == "l2_with_std":
                out["fine_loss"] = fine_loss_l2_std(expec_f, expec_f_gt, gt_mask)
            else:
                out["fine_loss"] = fine_loss_l2(expec_f, expec_f_gt, gt_mask)
            err = jnp.linalg.norm(expec_f_gt - expec_f[:, :2], axis=-1)
            denom = jnp.maximum(jnp.sum(gt_mask), 1.0)
            out["fine_err"] = (jnp.sum(err * gt_mask) / denom) * (wsz // 2) * sf
        return out

    # ------------------------------------------------------------------
    # top-level passes
    # ------------------------------------------------------------------

    def _keypoints(self, ctx: SceneContext, batch: Dict[str, Array], rng: Array):
        cfg = self.cfg
        if cfg.keypoints_3d_source == "sfm" and "points3d" in batch:
            pts_all = batch["points3d"][:, :3]
            n = cfg.matching.fine_num_3d_keypoints
            p_mask = batch.get("points3d_mask",
                               jnp.ones(pts_all.shape[0], dtype=bool))
            logits = jnp.where(p_mask, 0.0, -jnp.inf)
            g = jax.random.gumbel(rng, logits.shape) + logits
            _, idx = jax.lax.top_k(g, n)
            pts = pts_all[idx]
            desc, pts3d, pts3d_ndc = self.model_3d.query_coarse(ctx, pts)
        else:
            desc, pts3d, pts3d_ndc = self.model_3d.query_coarse(ctx, None, rng)
        return desc, pts3d, pts3d_ndc

    def train_forward(self, batch: Dict[str, Array], rng: Array) -> Dict[str, Array]:
        """One training query -> losses (reference forward, :239-406 train path)."""
        cfg = self.cfg
        rng_kp, rng_ray = jax.random.split(rng)
        ctx, q2d = self.build_context(batch)
        H, W = batch["image"].shape[0], batch["image"].shape[1]

        outputs: Dict[str, Array] = {}
        loss = jnp.float32(0.0)

        if cfg.train_pose:
            desc_3d, pts3d, pts3d_ndc = self._keypoints(ctx, batch, rng_kp)
            j_gt, gt_mask, proj_gt = self.build_3d_2d_pairs(
                pts3d, batch["depth"], batch["K"], batch["pose"], H, W,
                q2d["stride_coarse"], cfg.matching.coarse_matching_depth_thresh)
            m = self.match(ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc, True,
                           j_gt, gt_mask, proj_gt)
            outputs["coarse_loss"] = m["coarse_loss"]
            outputs["fine_loss"] = m["fine_loss"]
            outputs["fine_err"] = m["fine_err"]
            outputs["match_j"] = m["match_j"]
            outputs["match_mask"] = m["match_mask"]
            outputs["j_gt"] = j_gt
            outputs["gt_mask"] = gt_mask
            loss = loss + cfg.coarse_loss_weight * m["coarse_loss"] \
                        + cfg.fine_loss_weight * m["fine_loss"]

            if cfg.cascade_matching:
                # train the cascade matcher on GT-pose-visible keypoints
                # (reference uses T_init=GT in training, :332-336)
                vis = select_visible_mask(pts3d, batch["pose"], batch["K"],
                                          H, W)
                m2 = self.match(ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc,
                                True, j_gt, gt_mask, proj_gt, kp_mask=vis,
                                second=True)
                outputs["coarse_loss2"] = m2["coarse_loss"]
                outputs["fine_loss2"] = m2["fine_loss"]
                loss = loss + cfg.coarse_loss_weight * m2["coarse_loss"] \
                            + cfg.fine_loss_weight * m2["fine_loss"]

        # reference depth supervision (reference :351-362)
        depths_gt = batch.get("topk_depths_gt", batch["topk_depths"])
        ref_depth_loss = self.model_3d.multiview_aggregator.ref_depth_loss(
            ctx.sv, depths_gt)
        outputs["ref_depth_loss"] = ref_depth_loss
        loss = loss + cfg.ref_depth_loss_weight * ref_depth_loss

        if cfg.train_nerf:
            render_loss, psnr = self.compute_render_loss(ctx, q2d, batch, rng_ray)
            outputs["render_loss"] = render_loss
            outputs["psnr"] = psnr
            loss = loss + cfg.render_loss_weight * render_loss

        outputs["loss"] = loss
        return outputs

    def compute_render_loss(self, ctx: SceneContext, q2d: Dict[str, Array],
                            batch: Dict[str, Array], rng: Array):
        """Sample N_rand rays, render, NeRF-W loss (model.py:641-685)."""
        cfg = self.cfg
        H, W = batch["image"].shape[0], batch["image"].shape[1]
        n_rays = cfg.render.N_rand

        idx = jax.random.choice(rng, H * W, (n_rays,), replace=False)
        uv = jnp.stack([(idx % W).astype(jnp.float32),
                        (idx // W).astype(jnp.float32)], axis=-1)
        rays_o, rays_d = rays_for_pixels(uv, batch["K"], batch["pose"])
        preds = self.model_3d.render_rays(ctx, rays_o, rays_d, batch["pose"],
                                          train=True)

        ui, vi = idx % W, idx // W
        targets = {"rgb": batch["image"][vi, ui]}
        mask = preds["mask"]
        if "target_mask" in batch:
            mask = mask & (batch["target_mask"][vi, ui] > 0)
        targets["mask"] = mask
        if cfg.use_depth_supervision:
            targets["depth"] = batch["depth"][vi, ui]
            targets["depth_range"] = (batch["near"], batch["far"])
        if cfg.render.render_feature:
            # layer1 bilinearly upsampled to (H, W) with align_corners=False,
            # then indexed (model.py:668-672): equivalent to sampling the
            # stride-s map at (p + 0.5)/s - 0.5.
            s = q2d["stride_fine"]
            feat_uv = (uv + 0.5) / s - 0.5
            targets["feat"] = bilinear_sample(q2d["feat_fine"][0], feat_uv)

        loss = rendering_loss(preds, targets, use_depth=cfg.use_depth_supervision)
        psnr = mse2psnr(img2mse(preds["rgb"], targets["rgb"], mask=mask))
        return loss, psnr

    def localize_forward(self, batch: Dict[str, Array], rng: Array) -> Dict[str, Array]:
        """Eval path: features -> 3D descriptors -> matching -> on-device
        PnP-RANSAC, all inside one jittable function (reference estimate +
        estimate_pose, nerf_pose_estimator.py:408-583, where PnP left the
        device for pycolmap)."""
        rng_kp, rng_pnp = jax.random.split(rng)
        ctx, q2d, desc_3d, pts3d, pts3d_ndc, m = self.localize_parts(batch, rng_kp)
        pnp = ransac_pnp(m["mkps2d_f"], m["mkps3d"], m["pair_mask"],
                         batch["K"], rng_pnp,
                         thresh_px=self.cfg.ransac_thresh,
                         n_hyps=self.cfg.shapes.pnp_hypotheses)
        return {
            "mkps2d": m["mkps2d_f"],
            "mkps3d": m["mkps3d"],
            "match_mask": m["pair_mask"],
            "match_j": m["match_j"],
            "score_matrix": m["score_matrix"],
            "pose": pnp.c2w,
            "num_inliers": pnp.num_inliers,
            "pnp_success": pnp.success,
        }

    def localize_parts(self, batch: Dict[str, Array], rng: Array):
        """First localization pass + everything the eval orchestrator needs
        for the cascade / refinement passes (context is a pytree, so it can
        cross the apply boundary)."""
        ctx, q2d = self.build_context(batch)
        desc_3d, pts3d, pts3d_ndc = self._keypoints(ctx, batch, rng)
        m = self.match(ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc, False)
        return ctx, q2d, desc_3d, pts3d, pts3d_ndc, m

    def match_cascade(self, ctx: SceneContext, q2d: Dict[str, Array],
                      batch: Dict[str, Array], desc_3d: Array, pts3d: Array,
                      pts3d_ndc: Array, pose_init: Array) -> Dict[str, Array]:
        """Second matching pass over keypoints visible from the initial pose
        estimate (reference cascade, nerf_pose_estimator.py:330-349)."""
        H, W = batch["image"].shape[0], batch["image"].shape[1]
        vis = select_visible_mask(pts3d, pose_init, batch["K"], H, W)
        return self.match(ctx, q2d, batch, desc_3d, pts3d, pts3d_ndc, False,
                          kp_mask=vis, second=True)

    def render_image_rays(self, batch: Dict[str, Array], rays_o: Array,
                          rays_d: Array) -> Dict[str, Array]:
        """Render a chunk of rays for a query (used by render_image / the
        pose refiner)."""
        ctx, _ = self.build_context(batch)
        return self.model_3d.render_rays(ctx, rays_o, rays_d, batch["pose"],
                                         train=False)

    def __call__(self, batch: Dict[str, Array], rng: Array):
        """Init path: traces the full train graph."""
        return self.train_forward(batch, rng)
