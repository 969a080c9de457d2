"""nerfloc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) visual-localization framework.

Re-implements the capabilities of NeRF-Loc (arXiv:2304.07979): conditional-NeRF
scene representation, 3D-2D coarse-to-fine matching, on-device PnP-RANSAC and
differentiable pose refinement — designed TPU-first with static shapes, masked
fixed-size buffers, SPMD over jax.sharding meshes, and Pallas kernels for the
hot paths.

Layering (cf. reference layer map, SURVEY.md §1):
  geometry/  pure camera / SE(3) math (L1)
  ops/       KNN, bilinear sampling, Pallas kernels (L0)
  models/    2D backbone, conditional NeRF fields, matchers (L3/L4)
  render/    ray sampling + volume rendering (L3)
  solve/     PnP-RANSAC + pose refinement (L4)
  parallel/  mesh / sharding / collectives (replaces DDP) (L5)
  data/      scene store, synthetic scenes, preprocessing (L2/L6)
  train/     train & eval steps, checkpointing, metrics (L5)
  configs/   typed config tree mirroring the reference flag set (L7)
"""

__version__ = "0.1.0"
