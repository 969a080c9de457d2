from .mesh import MeshSpec, make_mesh, batch_sharding, replicated

__all__ = ["MeshSpec", "make_mesh", "batch_sharding", "replicated"]
