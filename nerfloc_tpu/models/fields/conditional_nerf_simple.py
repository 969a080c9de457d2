"""Ablation field: plain projection-average conditioning.

Rebuild of ConditionalNeRFSimple (reference: nerf_loc/models/conditional_nerf/
model_simple.py:17-95): `query` skips NeuRay visibility and KNN attention —
features are the mask-weighted mean of projected multi-view samples — and the
coarse/fine descriptors are single Dense projections of that mean. Selected by
cfg.simple_3d_model (reference nerf_pose_estimator.py model selection).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...geometry.cameras import world_to_camera
from .conditional_nerf import ConditionalNeRF
from .context import SceneContext
from .projector import project_and_sample

Array = jax.Array


class ConditionalNeRFSimple(ConditionalNeRF):

    def setup(self):
        super().setup()
        cfg = self.cfg
        self.out_fc = nn.Dense(cfg.model_3d_hidden_dim, dtype=self.dtype)

    def query(self, ctx: SceneContext, xyz: Array, level: str, K: int,
              direction: Optional[Array] = None,
              knn_idx: Optional[Array] = None,
              proj=None, cand=None, mv_samples=None) -> Dict[str, Array]:
        """Mask-weighted projection average (model_simple.py:26-57).
        knn_idx/proj/cand/mv_samples are accepted for render_rays interface
        parity and ignored (this ablation does no KNN and samples its own
        projections)."""
        featmaps = ctx.feat_coarse_src if level == "coarse" else ctx.feat_fine_src
        rgb, feat, mask = project_and_sample(xyz, ctx.sv.Ks, ctx.sv.poses,
                                             ctx.sv.images, featmaps)
        weight = mask / (jnp.sum(mask, axis=1, keepdims=True) + 1e-8)
        mv_feat = jnp.concatenate([rgb, feat], axis=-1)  # [N, V, 3+C]
        feature_agg = self.out_fc(jnp.sum(mv_feat * weight, axis=1))
        return {
            "feature_agg": feature_agg,
            "feature": mv_feat,
            "weights": weight[..., 0],
            "multiview_feature": mv_feat,
            "multiview_visibility": mask,
        }

    def query_coarse(self, ctx: SceneContext, points: Optional[Array] = None,
                     rng: Optional[Array] = None):
        """model_simple.py:59-79: descriptor = Dense(feature_agg) only."""
        if points is None:
            pts3d, pts3d_ndc, _ = self.sample_keypoints(
                ctx, rng, self.cfg.matching.fine_num_3d_keypoints)
        else:
            pts3d = points
            pts3d_ndc = world_to_camera(ctx.sv.poses[0], points)
        qd = self.query(ctx, pts3d, level="coarse", K=8)
        desc = self.proj_layer_3d_coarse(qd["feature_agg"])
        return desc, pts3d, pts3d_ndc

    def query_fine(self, ctx: SceneContext, points: Array):
        """model_simple.py:81-95."""
        qd = self.query(ctx, points, level="fine", K=1)
        return self.proj_layer_3d_fine(qd["feature_agg"])
