"""Multi-chip training: ray-parallel shard_map train step.

New capability over the reference (which has no distributed support, SURVEY
§2.4).  Layout:

* field params / optimizer state / occupancy bitfield: **replicated**;
* the ray batch: **sharded** along the ray axis over the ``data`` mesh axis
  (each chip samples and renders ``batch_size / n_devices`` rays);
* gradients and scalar metrics: ``psum``/``pmean`` over ICI;
* the optimizer update is computed identically on every chip from the
  reduced gradients, keeping params replicated without a broadcast.

The density-grid refresh also fans out: each chip evaluates a shard of the
sampled cells and the grids are max-reduced (``psum``-free: occupancy is a
monotone max), here done by sharding the cell axis and ``pmax``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..ops.rays import get_rays
from ..render.renderer import render_train
from ..train.state import TrainState, make_optimizer
from ..train.step import Batch, sample_batch
from .mesh import DATA_AXIS


def make_sharded_train_step(cfg: Config, mesh: Mesh, sample_cap: int):
    """Build a jitted, shard_map'd train step over ``mesh``."""
    n_dev = mesh.devices.size
    assert cfg.train.batch_size % n_dev == 0, (
        f"batch_size {cfg.train.batch_size} not divisible by "
        f"{n_dev} devices"
    )
    local_batch = cfg.train.batch_size // n_dev
    optimizer = make_optimizer(cfg)

    def local_step(state: TrainState, data: Batch):
        # decorrelate per-chip ray sampling
        axis = jax.lax.axis_index(DATA_AXIS)
        rng, k_batch, k_render = jax.random.split(
            jax.random.fold_in(state.rng, axis), 3
        )
        rgb_gt, pose, direction = sample_batch(
            k_batch, data, local_batch, cfg.train.ray_sampling_strategy
        )
        rays_o, rays_d = get_rays(direction, pose)

        def loss_fn(params):
            results = render_train(
                params,
                cfg.model,
                cfg.render,
                state.occupancy.bitfield,
                rays_o,
                rays_d,
                k_render,
                sample_cap,
            )
            return jnp.mean((results["rgb"] - rgb_gt) ** 2), results

        (loss, results), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # ICI gradient reduction
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "rm_samples": jax.lax.psum(results["rm_samples"], DATA_AXIS),
            "counts_max": jax.lax.pmax(
                jnp.max(results["counts"]), DATA_AXIS
            ),
        }
        # keep the carried rng identical across chips
        rng0 = jax.lax.all_gather(rng, DATA_AXIS)[0]
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            occupancy=state.occupancy,
            rng=rng0,
        )
        return new_state, metrics

    state_specs = TrainState(
        params=P(),
        opt_state=P(),
        occupancy=P(),
        rng=P(),
    )
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place (replicate) a train state onto the mesh."""
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def shard_batch(data: Batch, mesh: Mesh) -> Batch:
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    return jax.device_put(data, repl)
