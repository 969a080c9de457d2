"""Ray-parallel rendering across the mesh `ray` axis.

The reference renders one image per GPU with a serial chunk loop
(reference: conditional_nerf/model.py:616-635). Here the rays of a single
query can additionally be sharded across chips: parameters and the scene
context are replicated, the ray axis carries a `ray` sharding, and XLA
partitions the whole render (distance matmuls, PartialReduce top-k, MLPs)
row-wise over ICI with no manual collectives.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import Config


def make_ray_sharded_render(model, cfg: Config, mesh: Mesh) -> Callable:
    """Returns render(params, ctx, rays_o, rays_d, pose) with the leading ray
    axis sharded over the mesh `ray` axis. Ray count must divide the axis."""
    repl = NamedSharding(mesh, P())
    rays = NamedSharding(mesh, P("ray"))

    @partial(jax.jit,
             in_shardings=(repl, repl, rays, rays, repl),
             out_shardings=rays)
    def render(params, ctx, rays_o, rays_d, pose):
        def f(m):
            return m.model_3d.render_rays(ctx, rays_o, rays_d, pose,
                                          train=False)
        return model.apply(params, method=f)

    return render


def make_context_builder(model, mesh: Mesh) -> Callable:
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(repl, repl), out_shardings=repl)
    def build(params, batch):
        return model.apply(params, batch, method=model.build_context)[0]

    return build
