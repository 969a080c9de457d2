"""Functional scene state.

The reference caches `support_neural_points` and `vis_featmaps` as module
attributes reset per frame (reference: conditional_nerf/model.py:79,289-290;
nerf_pose_estimator.py:288-290). In JAX that implicit state becomes an
explicit pytree — `SceneContext` — built once per query frame and threaded
through every query/render call, so jit sees pure functions of (params, ctx).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct

from .aggregator import SupportViews

Array = jax.Array


@struct.dataclass
class NeuralPoints:
    """Padded, masked neural point cloud (one of 'coarse' / 'fine' levels).

    Static capacity P = V * (H/stride) * (W/stride): every feature-map pixel
    of every support view is a slot; `mask` = (depth > 0) validity
    (replaces the reference's dynamic torch.nonzero gather, model.py:230).
    """
    xyz: Array          # [P, 3] world
    xyz_ndc: Array      # [P, 3] in reference-view (topk_poses[0]) frame
    feature: Array      # [P, 3+C] rgb + backbone feature
    confidence: Array   # [P, 1]
    direction: Array    # [P, 4] world view dir + view distance
    mask: Array         # [P] bool
    kp_score: Optional[Array] = None  # [P, 1] (coarse level only)


@struct.dataclass
class SceneContext:
    """Everything derived from the support set for one localization query."""
    sv: SupportViews           # images/depths/poses/Ks + NeuRay ray feats
    coarse: NeuralPoints
    fine: NeuralPoints
    feat_coarse_src: Array     # [V, Hc, Wc, C] support coarse features
    feat_fine_src: Array       # [V, Hf, Wf, C] support fine features
    embedding_a: Optional[Array] = None  # appearance embedding of the query
    # flat packed 4-corner gather tables (ops/interp.pack_bilinear_corners),
    # built once per query so every render chunk samples all support views
    # with one row gather (6x faster than the vmapped per-view gather).
    # With render.table_dtype='int8' this holds an ops/interp.QuantTable
    # (int8 rows + per-channel scale) instead of a plain array.
    fused_fine_packed: Optional[Any] = None  # [V*Hf*Wf, 4*(C+32)]
    rgb_packed: Optional[Array] = None         # [V*H*W, 12]
    # vis-featmap-only corner table for the NeuRay guided coarse pass
    # (predict_alpha_weights): its [V*R*64]-row sampling is the dominant
    # cost of hierarchical sampling and needs only the 32 ray-feat channels
    # (QuantTable under render.table_dtype='int8', like fused_fine_packed)
    vis_corner_packed: Optional[Any] = None  # [V*Hv*Wv, 128]
    # 3x3-window candidate table over the fine point grid for
    # projection-window render KNN (ops/knn.pack_xyz_window / knn_proj);
    # built only when the merged table below is unavailable
    xyz_window_packed: Optional[Array] = None  # [V*Hf*Wf, 90] bf16
    # merged render-gather table (ops/interp.pack_render_table): one row
    # per PADDED featmap cell holding [bilinear fused corners | 5x5 xyz
    # candidate window (channel-major)], so the proj-mode render hot loop
    # issues ONE [V*N]-row gather for features + KNN candidates
    # (render.use_merged_table). Supersedes fused_fine_packed /
    # xyz_window_packed when present; rgb_packed stays separate (see
    # pack_render_table docstring).
    render_table: Optional[Array] = None  # [V*(hf+4)*(wf+4), 4*Cf+250]
    # feature-ONLY corner table (no vis channels) for the visibility-pruned
    # render path (render.prune_views > 0): visibility is decoded first from
    # the cheap 32-ch vis_corner_packed sample over ALL views, then only the
    # top-k visible views per sample gather these wide feature rows
    # ([N*k] rows instead of [V*N]). Replaces fused_fine_packed when set.
    feat_fine_packed: Optional[Any] = None  # [V*Hf*Wf, 4*C]
