"""Compiled train / eval steps over the device mesh.

Replaces the reference's Lightning training_step / test_step + DDP
(reference: pl/model.py:43-179, pl/train.py:100-117). One jitted SPMD program:
the query batch is sharded over the mesh `data` axis, the model is vmapped
over the local shard, and XLA inserts the gradient all-reduce from the
sharding annotations (the NCCL all-reduce of DDP, but compiler-scheduled over
ICI).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import Config
from ..solve.pnp import ransac_pnp
from ..utils.metrics import compute_pose_error, matching_iou
from .state import TrainState

Array = jax.Array


def make_train_step(model, cfg: Config, mesh: Mesh) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `batch` is a pytree with leading axis B (global query batch), sharded over
    the mesh's `data` axis; parameters and optimizer state are replicated.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def loss_fn(params, batch, rng):
        B = batch["image"].shape[0]
        rngs = jax.random.split(rng, B)

        def one(b, r):
            return model.apply(params, b, r, method=model.train_forward)

        out = jax.vmap(one)(batch, rngs)
        loss = jnp.mean(out["loss"])
        metrics = {k: jnp.mean(v) for k, v in out.items()
                   if v.ndim <= 1 and jnp.issubdtype(v.dtype, jnp.floating)}
        if "match_j" in out:
            iou = jax.vmap(matching_iou)(out["match_j"], out["match_mask"],
                                         out["j_gt"], out["gt_mask"])
            metrics["matching_iou"] = jnp.mean(iou)
        return loss, metrics

    @partial(jax.jit,
             in_shardings=(repl, data, repl),
             out_shardings=(repl, repl),
             donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model, cfg: Config, mesh: Mesh) -> Callable:
    """Returns eval_step(params, batch, rng) -> per-query outputs.

    Full localization: features -> 3D descriptors -> matching -> on-device
    PnP-RANSAC -> pose error. Equivalent of the reference test_step
    (pl/model.py:92-179) but entirely on device (the reference crosses to CPU
    for pycolmap, nerf_pose_estimator.py:528-540).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def one(params, b, r):
        r_match, r_pnp = jax.random.split(r)
        out = model.apply(params, b, r_match, method=model.localize_forward)
        pnp = ransac_pnp(out["mkps2d"], out["mkps3d"],
                         out["match_mask"], b["K"], r_pnp,
                         thresh_px=cfg.ransac_thresh,
                         n_hyps=cfg.shapes.pnp_hypotheses)
        rot_err, trans_err = compute_pose_error(pnp.c2w, b["pose"])
        return {
            "rot_err_deg": rot_err,
            "trans_err_m": trans_err,
            "num_inliers": pnp.num_inliers,
            "num_matches": jnp.sum(out["match_mask"].astype(jnp.int32)),
            "pose_pred": pnp.c2w,
            "pnp_success": pnp.success,
        }

    @partial(jax.jit, in_shardings=(repl, data, repl), out_shardings=data)
    def eval_step(params, batch, rng):
        B = batch["image"].shape[0]
        rngs = jax.random.split(rng, B)
        return jax.vmap(partial(one, params))(batch, rngs)

    return eval_step
