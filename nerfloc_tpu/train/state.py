"""Train state + optimizer.

Rebuild of the reference's Lightning optimizer config (reference:
pl/model.py:294-300 — Adam(lr) + StepLR(decay_steps, decay_factor)) and the
NaN/Inf gradient zeroing (reference pl/model.py:281-292), expressed as optax
transforms so the whole update is part of the single compiled step.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs import Config


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def zero_nonfinite() -> optax.GradientTransformation:
    """Zero NaN/Inf gradient leaves elementwise — the reference zeroes whole
    parameters' grads on any non-finite entry in on_after_backward
    (pl/model.py:281-292); elementwise zeroing is strictly less destructive."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam + staircase step decay + grad clip 1.0 (reference pl/train.py:107
    gradient_clip_val=1.0; pl/model.py:294-300)."""
    schedule = optax.exponential_decay(
        init_value=cfg.lrate,
        transition_steps=cfg.lrate_decay_steps,
        decay_rate=cfg.lrate_decay_factor,
        staircase=True,
    )
    return optax.chain(
        zero_nonfinite(),
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(params, cfg: Config,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    tx = tx if tx is not None else make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)
