"""Training state: params + optimizer + occupancy grid, one pytree.

Replaces the reference's scattered torch state (module params, (Fused)Adam,
GradScaler, CosineAnnealingLR, grid buffers — ``train.py:119-163``).  bf16
compute needs no GradScaler; the optimizer is optax ``adam(eps=1e-15)`` with
a cosine schedule decaying to ``lr / 30``, matching
``CosineAnnealingLR(max_steps, lr/30)`` exactly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.registry import get_model
from ..models.occupancy import OccupancyGrid, init_occupancy


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    occupancy: OccupancyGrid
    rng: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.train.lr,
        decay_steps=cfg.train.max_steps,
        alpha=1.0 / cfg.train.lr_final_div,
    )
    return optax.adam(learning_rate=schedule, eps=cfg.train.adam_eps)


def create_train_state(cfg: Config, seed: int | None = None) -> TrainState:
    seed = cfg.train.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    params = get_model(cfg.model.name).init_params(k_init, cfg.model)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        occupancy=init_occupancy(cfg.model),
        rng=k_run,
    )


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
