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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import Config
from ..geometry.cameras import get_rays


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


def make_batched_ray_sharded_render(model, cfg: Config, mesh: Mesh) -> Callable:
    """Combined (data x ray) 2D-mesh render: each `data` row renders a
    DIFFERENT query (its own SceneContext) while that query's rays are
    sharded across the `ray` axis.

    Returns render(params, ctxs, rays_o, rays_d, poses) where every ctx leaf
    and poses carry a leading query axis sharded over `data`, and
    rays_o/rays_d are [Q, R, 3] sharded (data, ray). Params are replicated.
    XLA partitions the vmapped render over both axes with no manual
    collectives — the scaling surface SURVEY.md §2.5 lists as the TPU
    equivalent of the reference's one-query-per-GPU DDP.
    """
    repl = NamedSharding(mesh, P())
    per_q = NamedSharding(mesh, P("data"))
    rays = NamedSharding(mesh, P("data", "ray"))

    @partial(jax.jit,
             in_shardings=(repl, per_q, rays, rays, per_q),
             out_shardings=rays)
    def _render(params, ctxs, rays_o, rays_d, poses):
        def one(ctx, ro, rd, pose):
            def f(m):
                return m.model_3d.render_rays(ctx, ro, rd, pose, train=False)
            return model.apply(params, method=f)
        return jax.vmap(one)(ctxs, rays_o, rays_d, poses)

    def render(params, ctxs, rays_o, rays_d, poses):
        # stacked per-query contexts arrive COMMITTED (e.g. jnp.stack of
        # replicated build_context outputs); jit refuses to reshard
        # committed args, so re-place them onto the 2D layout here.
        ctxs = jax.device_put(ctxs, per_q)
        rays_o = jax.device_put(rays_o, rays)
        rays_d = jax.device_put(rays_d, rays)
        poses = jax.device_put(poses, per_q)
        return _render(params, ctxs, rays_o, rays_d, poses)

    return render


def render_image_ray_sharded(model, cfg: Config, params, ctx, K, pose,
                             H: int, W: int, mesh: Mesh,
                             render=None) -> dict:
    """Full-image render with each chunk's rays sharded over the mesh `ray`
    axis — the multi-chip replacement for ConditionalNeRF.render_image's
    single-device lax.map chunk loop (reference model.py:602-639). The chunk
    size is cfg.render.chunk * ray-axis-width, so per-chip work matches the
    single-device path while wall-clock divides by the axis width.
    """
    n_ray = mesh.shape["ray"]
    if render is None:
        render = make_ray_sharded_render(model, cfg, mesh)
    rays_o, rays_d = get_rays(H, W, K, pose)
    flat_o = jnp.asarray(rays_o).reshape(-1, 3)
    flat_d = jnp.asarray(rays_d).reshape(-1, 3)
    n = flat_o.shape[0]
    chunk = cfg.render.chunk * n_ray
    pad = (-n) % chunk
    if pad:
        # tile so the pad can exceed n (tiny image, big chunk) and every
        # chunk keeps the static size — one XLA compile, even sharding
        reps = -(-(n + pad) // n)
        flat_o = jnp.tile(flat_o, (reps, 1))[:n + pad]
        flat_d = jnp.tile(flat_d, (reps, 1))[:n + pad]
    outs = []
    for s in range(0, flat_o.shape[0], chunk):
        outs.append(render(params, ctx, flat_o[s:s + chunk],
                           flat_d[s:s + chunk], pose))
    out = {}
    for k in outs[0]:
        flat = np.concatenate([np.asarray(o[k]) for o in outs], axis=0)[:n]
        out[k] = flat.reshape((H, W) + flat.shape[1:])
    return out


def make_context_builder(model, mesh: Mesh) -> Callable:
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(repl, repl), out_shardings=repl)
    def build(params, batch):
        return model.apply(params, batch, method=model.build_context)[0]

    return build
