"""Dataset factory.

Rebuild of build_dataset (reference: nerf_loc/datasets/__init__.py:15-52):
`dataset_type` selects the family, per-scene stores are wrapped in a
MultiSceneDataset. Dataset YAMLs live at configs/data/{name}.yaml with the
reference's declaration surface (base_dir, scene list, TRANSFORM /
AUG_TRANSFORM pipelines, near/far/scale overrides).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

from ..configs import Config
from .scene_store import SceneStore
from .transforms import build_transforms
from .video_dataset import DataOptions, MultiSceneDataset, VideoDataset

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "configs", "data")


def load_data_yaml(dataset_type: str) -> Dict[str, Any]:
    import yaml

    if dataset_type.endswith((".yaml", ".yml")) and os.path.exists(dataset_type):
        path = dataset_type  # direct-path dataset declaration
    else:
        path = os.path.join(_CONFIG_DIR, f"{dataset_type}.yaml")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def build_dataset(cfg: Config, split: str, mode: Optional[str] = None,
                  data_cfg: Optional[Dict[str, Any]] = None) -> MultiSceneDataset:
    """split: 'train' | 'test'; mode defaults to split."""
    mode = mode or ("train" if split == "train" else "test")
    dc = dict(load_data_yaml(cfg.dataset_type))
    if data_cfg:
        dc.update(data_cfg)

    base_dir = cfg.datadir or dc.get("base_dir", "")
    scenes: List[str] = list(cfg.scenes) or list(dc.get("scenes", []))
    if not scenes:
        raise ValueError("no scenes configured (cfg.scenes or data yaml)")

    # fail fast on near-miss keys: a lowercase 'transforms:' section would
    # otherwise be SILENTLY ignored (the declaration surface is the
    # reference's uppercase TRANSFORM / AUG_TRANSFORM, dataset.py:86-99)
    bad = [k for k in dc if k.lower() in
           ("transform", "transforms", "aug_transform", "aug_transforms")
           and k not in ("TRANSFORM", "AUG_TRANSFORM")]
    if bad:
        raise ValueError(
            f"unknown data-yaml key(s) {bad}: transform pipelines are "
            "declared as TRANSFORM / AUG_TRANSFORM "
            "([{'ResizeAndCrop': {...}}, ...], reference dataset.py:86-99)")
    transforms = build_transforms(dc.get("TRANSFORM", []))
    aug_transforms = build_transforms(dc.get("AUG_TRANSFORM", []))

    n_views = cfg.n_views_train if mode == "train" else cfg.n_views_test
    opts = DataOptions(
        n_views=n_views,
        support_image_selection=cfg.support_image_selection,
        image_core_set_size=cfg.image_core_set_size,
        coreset_sampler=cfg.coreset_sampler,
        max_points=cfg.matching.keypoints_3d_sampling_max_keep,
        aug_ref_depth=bool(dc.get("aug_ref_depth", False)),
    )

    if cfg.dataset_type == "blender":
        # NeRF-synthetic scenes (reference reaches these via the NeuRay
        # submodule, neuray_base_dataset.py:20-81)
        from .blender_scene import blender_scene_store

        datasets = []
        for scene in scenes:
            store = blender_scene_store(base_dir, scene,
                                        near=float(dc.get("near", 2.0)),
                                        far=float(dc.get("far", 6.0)))
            datasets.append(VideoDataset(store, split, transforms,
                                         aug_transforms, opts, mode))
        return MultiSceneDataset(datasets)

    if cfg.dataset_type == "llff":
        from .llff_scene import llff_scene_store

        datasets = []
        for scene in scenes:
            store = llff_scene_store(base_dir, scene,
                                     factor=int(dc.get("factor", 4)))
            datasets.append(VideoDataset(store, split, transforms,
                                         aug_transforms, opts, mode))
        return MultiSceneDataset(datasets)

    if cfg.dataset_type == "dtu":
        # DTU MVS rectified layout (reference reaches DTU via the NeuRay
        # submodule, neuray_base_dataset.py:20-81 — empty in the checkout)
        from .dtu_scene import dtu_scene_store

        datasets = []
        for scene in scenes:
            store = dtu_scene_store(
                base_dir, scene, light=str(dc.get("light", "3")),
                intrinsic_scale=float(dc.get("intrinsic_scale", 4.0)))
            datasets.append(VideoDataset(store, split, transforms,
                                         aug_transforms, opts, mode))
        return MultiSceneDataset(datasets)

    if cfg.dataset_type == "colmap":
        # COLMAP dense workspaces (reference ColmapDataset dispatch,
        # datasets/__init__.py:15-52); one workspace per "scene" path
        from .colmap_scene import colmap_scene_store

        datasets = []
        for scene in scenes:
            store = colmap_scene_store(
                os.path.join(base_dir, scene) if base_dir else scene,
                depth_type=dc.get("depth_type", "colmap"), scene=scene)
            datasets.append(VideoDataset(store, split, transforms,
                                         aug_transforms, opts, mode))
        return MultiSceneDataset(datasets)

    datasets = []
    for scene in scenes:
        store = SceneStore.load(
            base_dir, scene,
            retrieval_method_train=cfg.image_retrieval_method_train,
            retrieval_method_test=cfg.image_retrieval_method_test,
            near=dc.get("near"), far=dc.get("far"),
            scale_factor=dc.get("scale_factor"),
            rescale_far_limit=dc.get("rescale_far_limit"),
            tempo_interval=int(dc.get("tempo_interval", 1)),
        )
        datasets.append(VideoDataset(
            store, split, transforms, aug_transforms, opts, mode,
            test_time_color_jitter=cfg.test_time_color_jitter,
            test_time_style_change=cfg.test_time_style_change))
    return MultiSceneDataset(datasets)
