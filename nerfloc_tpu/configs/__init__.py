"""Typed config tree.

Mirrors the reference flag inventory (reference: nerf_loc/configs/__init__.py:4-92)
but as frozen dataclasses so configs are hashable and can participate in jit
static arguments. YAML files override defaults via `load_config`.

TPU-specific additions live under `StaticShapeConfig`: the reference uses
dynamic shapes (variable support-point counts, variable match counts); XLA
needs static bounds, so every dynamic axis of the reference becomes a padded
buffer + mask with a capacity declared here.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass(frozen=True)
class RenderConfig:
    # reference: configs/__init__.py:54-62
    N_samples: int = 64
    N_importance: int = 0
    # depth count of the NeuRay guide pass that drives N_importance
    # resampling. The reference hardcodes 64 (conditional_nerf/model.py:
    # 489); configurable here because the guide pass is a large share of
    # the guided-16+16 render (a [V*R*N_guide]-row vis-table gather +
    # mixture-logistics decode), so production configs can trade guide
    # resolution for throughput (tools/guided_sampling_check.py measures
    # the PSNR cost; tools/profile_int8_tables.py is the throughput A/B
    # pattern).
    N_guide: int = 64
    N_rand: int = 1024
    chunk: int = 2048
    lindisp: bool = False
    white_bkgd: bool = False
    use_render_uncertainty: bool = True
    render_feature: bool = True
    # Render-loop KNN strategy (TPU addition; the reference runs exact
    # pytorch3d KNN per sample, model.py:509-517):
    #   'proj' (default) — projection-window KNN (ops/knn.knn_proj):
    #     candidates are the 3x3 featmap windows around each sample's
    #     support-view projections (the fine points ARE that pixel grid),
    #     exact f32 re-rank. Surface recall ~0.99 at production density.
    #   'flat' — near-exact per-sample KNN over the whole cloud
    #     (reference semantics; ~2.3x slower render at [4096x64 x 24k]).
    #   'ray'  — per-ray segment-distance pruning (knn_rays). Fast, but
    #     candidate recall collapses at production cloud density (~6.5%
    #     measured) because thousands of points tie at ~0 segment
    #     distance; kept for small/sparse clouds.
    knn_mode: str = "proj"
    # knn_proj window side: 3 -> 0.97 at-surface recall; 5 -> 1.00
    # at-surface and 0.45 in the 6-30cm band at ~2.8x the candidate-table
    # width (tools/knn_recall_study.py). End-to-end on a TRAINED model
    # (tools/knn_mode_study.py, BASELINE.md): win=3 already matches exact
    # flat KNN (+0.04 dB PSNR, identical refined pose) and win=5 adds
    # nothing (+0.03 dB) — so the default stays at the narrower table.
    knn_proj_window: int = 3
    # merged render-gather table (ops/interp.pack_render_table): ONE row
    # gather per (sample, view) fetches bilinear featmap corners plus a
    # 5x5 KNN candidate window ([-1..+3] around the bilinear floor cell —
    # a strict superset of knn_proj(win=3)'s round-anchored 3x3; see
    # ops/interp.RENDER_WINDOW); full-res rgb keeps its own 12-column
    # table. OFF by default: on v5e the single wide gather LOSES to the
    # two separate gathers at bench shapes (dense-64 35.9k vs 47.1k
    # rays/s) — the hot gathers are bandwidth- not dispatch-bound, so
    # merging saves nothing while the 25-slot window nearly triples the
    # candidate payload and the re-rank sort lanes (V*25 vs V*9). See
    # BASELINE.md "Merged render-table post-mortem". The path stays
    # correct and equivalence-tested (tests/test_render_table.py) and
    # auto-falls-back to separate tables when the fine/vis featmap
    # resolutions differ or knn_mode != 'proj'.
    use_merged_table: bool = False
    # visibility-pruned support views in the proj-mode render hot loop:
    # 0 = off (reference semantics: every sample aggregates all V views);
    # k > 0 = decode NeuRay visibility from the cheap 32-ch vis table for
    # all V views first, then gather the WIDE per-view feature rows (and
    # rgb corners) only for each sample's top-k most visible views and run
    # the mean/var fusion + rgb blending over those k. Cuts the dominant
    # [V*N]-row x 1792B fused gather and the whole per-view tail by k/V
    # (BASELINE.md render roofline, 'fewer views per sample'). Dropped
    # views are the lowest-visibility ones, whose fusion weight and
    # blending softmax mass are smallest. k >= V is exactly unpruned.
    prune_views: int = 0
    knn_candidates: int = 128
    # neighbor geometry/feature assembly in the render hot loop: 'gather'
    # does one [R*S*K]-row packed gather; 'onehot' selects neighbors from
    # per-ray candidate tables with a one-hot MXU matmul (bf16 hi/mid/lo
    # split keeps f32 geometry exact to 24 bits). Default 'gather': the
    # batched [R x (S*K, C)@(C, 25+F)] one-hot matmul is dispatch-bound at
    # R=4096 tiny batches and measured ~8ms SLOWER in the full render on
    # v5e (109.6 vs 101.8ms), even though isolated gather rows cost more.
    geo_assembly: str = "gather"
    # dtype of the packed render gather tables (fused fine corners + the
    # guided pass's vis corners): 'bf16' (compute dtype) or 'int8'
    # (symmetric per-channel quantization, ops/interp.QuantTable) — halves
    # the bytes of the render loop's HBM-bound table gathers at ~0.4%
    # per-channel feature error. Default bf16: int8 MEASURES SLOWER on
    # v5e (dense-64 47.3k vs 50.8k rays/s) because TPU row gathers move
    # sub-word elements at ~35% lower per-byte rate — see BASELINE.md
    # "int8 render-table post-mortem". rgb / xyz candidate tables are
    # unaffected (rgb is 12 cols and latency-bound; KNN geometry exact).
    # Precedence: with use_merged_table=True (+ matching featmap
    # resolutions + knn_mode='proj') the bf16 merged render_table REPLACES
    # the fused-corner table, so 'int8' then applies only to the guided
    # pass's vis corner table. Inference/throughput knob ONLY: the
    # quantizer has no straight-through gradient, so training with 'int8'
    # would silently zero the render-loss gradients into the feature maps.
    table_dtype: str = "bf16"
    # fused Pallas neighbor-aggregation kernel for query()'s embed ->
    # base_mlp -> attention segment (ops/fused_agg.py); backward replays
    # the pure-JAX path via custom_vjp. Default OFF: the per-neighbor
    # unrolled v1 kernel measured 108ms vs 75ms pure-XLA at render scale
    # on v5e (TPU matmuls are row-bound, so its ~15 thin matmuls per
    # neighbor slot cost more than the HBM round trips they save).
    fused_query_agg: bool = False


@dataclass(frozen=True)
class MatchingConfig:
    # reference: configs/__init__.py:72-78
    keypoints_3d_sampling: str = "random"
    keypoints_3d_sampling_max_keep: int = 100000
    coarse_matching_depth_thresh: float = 2.0
    coarse_num_3d_keypoints: int = 1024
    fine_num_3d_keypoints: int = 1024
    # TPU addition: static cap on the number of coarse 2D grid cells
    # (Hc*Wc after ResizeAndCrop; 256/8 * 341/8 bounded by 2048).
    max_kp2d: int = 2048
    # static cap on fine-stage pairs (train: GT pairs, test: mutual-NN hits)
    max_fine_pairs: int = 1024
    fine_window_size: int = 7
    thr: float = 0.2


@dataclass(frozen=True)
class StaticShapeConfig:
    """Capacities for the padded/masked buffers that replace the reference's
    dynamic shapes. All counts are per localization query."""
    n_views: int = 10                 # support views held in the batch
    image_h: int = 256
    image_w: int = 256
    # support neural points: every feature-stride pixel of every support view
    # becomes a (possibly masked) neural point -> V * (H/s) * (W/s).
    # Derived at model-build time; no independent knob needed.
    n_rays_train: int = 1024          # == render.N_rand
    pnp_hypotheses: int = 512         # RANSAC hypothesis count (vmapped)
    pose_refine_rays: int = 512       # rays per refinement step (pose_optimizer.py:124)


@dataclass(frozen=True)
class Config:
    # experiment / io (reference configs/__init__.py:5-11)
    expname: str = ""
    basedir: str = ""
    datadir: str = ""
    version: str = "default"
    ckpt: str = ""
    dataset_type: str = "video_7scenes"
    scenes: Tuple[str, ...] = ()

    # schedule (reference :13-16)
    max_epochs: int = 50
    lrate: float = 5e-4
    lrate_decay_steps: int = 50000
    lrate_decay_factor: float = 0.5

    train_nerf: bool = True
    train_pose: bool = True

    # 2D backbone (reference :21-25)
    backbone2d: str = "cotr"
    backbone2d_fpn_dim: int = 192
    backbone2d_use_fpn: bool = True
    backbone2d_coarse_layer_name: str = "layer2"
    backbone2d_fine_layer_name: str = "layer1"

    # support images (reference :28-39)
    support_image_selection: str = "retrieval"
    n_views_train: int = 5
    n_views_test: int = 10
    image_core_set_size: int = 16
    image_retrieval_method: str = "netvlad"
    image_retrieval_method_train: str = "netvlad"
    image_retrieval_method_test: str = "netvlad"
    image_retrieval_interval_train: int = 1
    image_retrieval_interval_test: int = 1
    coreset_sampler: str = "FPS"

    model_3d_hidden_dim: int = 128
    use_scene_coord_memorization: bool = False

    encode_appearance: bool = True
    appearance_emb_dim: int = 128

    simple_3d_model: bool = False

    # positional embedding (reference :50-52)
    multires: int = 10
    multires_views: int = 4
    i_embed: int = 0

    render: RenderConfig = field(default_factory=RenderConfig)

    # losses (reference :64-68)
    use_depth_supervision: bool = False
    coarse_loss_weight: float = 10000.0
    fine_loss_weight: float = 10.0
    render_loss_weight: float = 1.0
    ref_depth_loss_weight: float = 0.1

    keypoints_3d_source: str = "depth"
    matcher_hidden_dim: int = 192
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    fine_matching_loss_type: str = "l2_with_std"

    ransac_thresh: float = 8.0
    rotation_eval_thresh: float = 5.0
    translation_eval_thresh: float = 0.05

    # test time (reference :85-92)
    cascade_matching: bool = False
    optimize_pose: bool = False
    # refinement-ray pixel sampling: 'random' | 'grid' (reference
    # PoseOptimizer(sampling=...), pose_optimizer.py:23,89-127)
    optimize_pose_sampling: str = "random"
    test_time_color_jitter: bool = False
    test_time_style_change: bool = False
    test_render_interval: int = 50
    vis_3d_box: bool = False
    vis_rendering: bool = False
    vis_trajectory: bool = False

    shapes: StaticShapeConfig = field(default_factory=StaticShapeConfig)

    # TPU execution knobs (no reference counterpart)
    compute_dtype: str = "bfloat16"   # matmul/conv compute dtype
    param_dtype: str = "float32"
    mesh_data_axis: int = 1           # data-parallel width (queries per step)
    mesh_ray_axis: int = 1            # ray-parallel width for rendering

    def __post_init__(self):
        # the 3D positional embedding is 6 channels per frequency band
        # (sin+cos x 3 axes) built from hidden_dim//6 bands, so a width
        # not divisible by 6 silently produces a narrower embedding that
        # later fails in the coarse transformer with an opaque broadcast
        # error (reference inherits the same constraint:
        # nerf_pose_estimator.py:68 get_embedder(hidden_dim//6))
        if self.matcher_hidden_dim % 6 != 0:
            raise ValueError(
                f"matcher_hidden_dim={self.matcher_hidden_dim} must be "
                "divisible by 6 (3D positional embedding packs "
                "sin+cos x 3 axes per band)")


def _merge(obj: Any, overrides: Dict[str, Any]) -> Any:
    """Recursively apply a nested dict onto a (frozen) dataclass tree."""
    if not dataclasses.is_dataclass(obj):
        return overrides
    kwargs = {}
    names = {f.name: f for f in dataclasses.fields(obj)}
    for k, v in overrides.items():
        if k not in names:
            raise KeyError(f"unknown config key: {k!r}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            kwargs[k] = _merge(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return dataclasses.replace(obj, **kwargs)


def get_cfg_defaults() -> Config:
    return Config()


def compute_dtype_of(cfg: Config):
    """Resolve cfg.compute_dtype to a jnp dtype (bf16 keeps params f32;
    flax Dense(dtype=...) casts activations only)."""
    import jax.numpy as jnp

    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Build a Config from defaults, an optional YAML file, and overrides.

    Equivalent of the reference's get_cfg_defaults + merge_from_file
    (reference: nerf_loc/configs/__init__.py:94-102).
    """
    cfg = Config()
    if path is not None:
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _merge(cfg, data)
    if overrides:
        cfg = _merge(cfg, overrides)
    return cfg


def override_cfg_with_args(cfg: Config, args: Any) -> Config:
    """Apply argparse namespace values onto matching top-level config keys."""
    names = {f.name for f in dataclasses.fields(cfg)}
    updates = {k: v for k, v in vars(args).items() if k in names and v is not None}
    return dataclasses.replace(cfg, **updates)
