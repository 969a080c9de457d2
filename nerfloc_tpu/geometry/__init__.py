from .cameras import (
    backproject_depth,
    camera_project,
    get_rays,
    pixel_grid,
    project_points,
    transform_points,
    world_to_camera,
)
from .se3 import (
    se3_exp_map,
    se3_log_map,
    so3_exp_map,
    so3_log_map,
    compute_pose_error,
)
from .embedder import Embedder, nerf_embedder, position_embedding_sine

__all__ = [
    "backproject_depth",
    "camera_project",
    "get_rays",
    "pixel_grid",
    "project_points",
    "transform_points",
    "world_to_camera",
    "se3_exp_map",
    "se3_log_map",
    "so3_exp_map",
    "so3_log_map",
    "compute_pose_error",
    "Embedder",
    "nerf_embedder",
    "position_embedding_sine",
]
