"""Grad-safe vector math primitives.

`jnp.linalg.norm` (and bare `jnp.sqrt`) have NaN gradients at exactly zero —
adding eps *after* the norm does not help because the NaN arises inside the
norm's own VJP. These helpers keep the operand of sqrt bounded away from zero
so autodiff through rendering (needed by the photometric pose refiner,
reference nerf_loc/models/pose_optimizer.py:134-156) stays finite even when a
query ray coincides with a support ray.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def safe_norm(x: Array, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-12) -> Array:
    """sqrt(sum(x^2) + eps): finite value and gradient everywhere."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x: Array, axis: int = -1, eps: float = 1e-6) -> Array:
    """x / max(|x|, eps) with a grad-safe norm."""
    n = safe_norm(x, axis=axis, keepdims=True, eps=eps * eps)
    return x / jnp.maximum(n, eps)


def safe_sqrt(x: Array, eps: float = 1e-12) -> Array:
    """sqrt with clamped operand (finite gradient at 0)."""
    return jnp.sqrt(jnp.maximum(x, eps))
