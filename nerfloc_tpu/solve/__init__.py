from .pnp import estimate_pose_pnp, ransac_pnp

__all__ = ["estimate_pose_pnp", "ransac_pnp"]
