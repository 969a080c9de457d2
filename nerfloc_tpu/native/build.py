"""On-demand native build + ctypes loading (no pybind11 dependency)."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_LOCK = threading.Lock()
_CACHE: dict = {}

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def load_library(name: str) -> ctypes.CDLL:
    """Compile nerfloc_tpu/native/<name>.cpp into a cached .so and dlopen it.

    The object is keyed by a source hash so edits trigger rebuilds.
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_SRC_DIR, f"{name}.cpp")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        build_dir = os.path.join(_SRC_DIR, "_build")
        os.makedirs(build_dir, exist_ok=True)
        so = os.path.join(build_dir, f"lib{name}-{digest}.so")
        if not os.path.exists(so):
            cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", src, "-o", so + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib
