"""Native (C++) runtime components, bound via ctypes.

The reference implements its preprocessing hot loops in CUDA/numba (TSDF
fusion, fusion.py) and its KNN in CUDA (knn.cu); the TPU compute path here is
JAX/Pallas, and the host-side runtime pieces are C++ (this package), built
on demand with g++ and cached next to the sources.
"""
from .build import load_library

__all__ = ["load_library"]
