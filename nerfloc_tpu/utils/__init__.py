from .metrics import compute_pose_error, matching_iou, pose_accuracy
from .common import colorize_depth

__all__ = [
    "compute_pose_error",
    "matching_iou",
    "pose_accuracy",
    "colorize_depth",
]
