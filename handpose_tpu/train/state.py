"""Train state, optimizer, and learning-rate schedule.

Reference training recipe (trainval.py:119-121): Adam lr=1e-4 with
CosineAnnealingLR(T_max=max_epoch, eta_min=1e-5) stepped once per epoch.
Here the same curve is expressed as an optax step-schedule quantised to
epochs.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def cosine_epoch_schedule(base_lr: float, eta_min: float, max_epoch: int,
                          steps_per_epoch: int):
    """CosineAnnealingLR semantics, quantised per epoch like
    ``scheduler.step()`` after each epoch (reference trainval.py:376)."""

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), max_epoch)
        cos = jnp.cos(jnp.pi * epoch / max_epoch)
        return eta_min + (base_lr - eta_min) * (1 + cos) / 2

    return schedule


def make_optimizer(base_lr: float = 1e-4, eta_min: float = 1e-5,
                   max_epoch: int = 60, steps_per_epoch: int = 1):
    return optax.adam(cosine_epoch_schedule(base_lr, eta_min, max_epoch,
                                            steps_per_epoch))


def create_train_state(model, cfg, sample_input_args, rng,
                       steps_per_epoch: int = 1) -> TrainState:
    """Initialise parameters + optimizer for a zoo model.

    The init is jitted: eager flax init dispatches each initializer op
    separately, and on a remote/tunneled device every one of those tiny
    dispatches pays the full round trip (measured minutes for the
    diffusion family; one compiled program is seconds and lands in the
    persistent compilation cache when enabled).
    """
    rngs = {"params": rng, "diffusion": jax.random.fold_in(rng, 1)}
    variables = jax.jit(model.init, static_argnames=("train",))(
        rngs, *sample_input_args, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax.core.freeze({}))
    tx = make_optimizer(cfg.lr, cfg.lr_min, cfg.max_epoch, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             batch_stats=batch_stats)
