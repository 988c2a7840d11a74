"""Multi-chip training: ray-parallel shard_map train step.

New capability over the reference (which has no distributed support, SURVEY
§2.4).  Layout:

* field params / optimizer state / occupancy bitfield: **replicated**;
* the ray batch: **sharded** along the ray axis over the ``data`` mesh axis
  (each chip renders ``batch_size / n_devices`` rays);
* gradients and scalar metrics: ``psum``/``pmean`` over ICI;
* the optimizer update is computed identically on every chip from the
  reduced gradients, keeping params replicated without a broadcast.

Exact single-chip parity by construction: every chip draws the FULL ray
batch and the full t-perturbation noise from the shared rng (cheap — a few
gathers) and takes its disjoint slice, so the union of the per-chip work
is bitwise the batch the single-chip ``train_step`` would have drawn from
the same state.  Losses are per-shard means ``pmean``-ed (equal shards →
the global mean), gradients follow by linearity; ``tests/test_sharding.py``
pins 8-way == single-chip to fp tolerance.

The density-grid refresh fans out the same way
(``sharded_density_grid_step``): each chip evaluates a 1/n_devices slice
of the sampled cells (same cells + jitter from the shared key), the probe
grids max-reduce with ``pmax`` (occupancy is a monotone max — no psum
needed), and the EMA merge + bitfield repack replay identically on every
chip.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.occupancy import update_density_grid
from ..models.registry import get_model
from ..ops.distortion import distortion_loss
from ..ops.rays import get_rays
from ..render.renderer import render_train
from ..train.state import TrainState, make_optimizer
from ..train.step import Batch, sample_batch
from .mesh import DATA_AXIS

_STATE_SPECS = TrainState(params=P(), opt_state=P(), occupancy=P(), rng=P())


def _shard_slice(x, dev, local):
    return jax.lax.dynamic_slice_in_dim(x, dev * local, local)


def _local_train_step(
    state: TrainState,
    data: Batch,
    *,
    cfg: Config,
    sample_cap: int,
    pack_cap: int | None,
    n_dev: int,
):
    """Per-chip body: full-batch draw, disjoint slice, full loss, pmean.

    Mirrors ``train/step.py:train_step`` exactly (MSE + distortion,
    same rng spine) so the sharded step is its distributed equal.
    """
    local_batch = cfg.train.batch_size // n_dev
    dev = jax.lax.axis_index(DATA_AXIS)
    rng, k_batch, k_render = jax.random.split(state.rng, 3)
    # full-batch draw with the SHARED key, then this chip's slice — the
    # global batch is bitwise what the single-chip step would sample
    rgb_gt, pose, direction = sample_batch(
        k_batch, data, cfg.train.batch_size, cfg.train.ray_sampling_strategy
    )
    k_noise, _ = jax.random.split(k_render)
    t_noise = jax.random.uniform(k_noise, (cfg.train.batch_size,))
    rgb_gt = _shard_slice(rgb_gt, dev, local_batch)
    pose = _shard_slice(pose, dev, local_batch)
    direction = _shard_slice(direction, dev, local_batch)
    t_noise = _shard_slice(t_noise, dev, local_batch)
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
            pack_cap,
            t_noise=t_noise,
        )
        loss = jnp.mean((results["rgb"] - rgb_gt) ** 2)
        if cfg.train.distortion_loss_w > 0:
            loss = loss + cfg.train.distortion_loss_w * jnp.mean(
                distortion_loss(
                    results["ws"],
                    results["deltas"],
                    results["ts"],
                    results["valid"],
                )
            )
        return loss, results

    (loss, results), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    # ICI reductions: per-shard means over equal shards -> global means
    grads = jax.lax.pmean(grads, DATA_AXIS)
    loss = jax.lax.pmean(loss, DATA_AXIS)
    optimizer = make_optimizer(cfg)
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)

    mse = jax.lax.pmean(
        jnp.mean((results["rgb"] - rgb_gt) ** 2), DATA_AXIS
    )
    metrics = {
        "loss": loss,
        "psnr": -10.0 * jnp.log10(mse),
        "rm_samples": jax.lax.psum(results["rm_samples"], DATA_AXIS),
        "vr_samples": jax.lax.psum(results["vr_samples"], DATA_AXIS),
        "counts_max": jax.lax.pmax(
            jnp.max(results["counts"]), DATA_AXIS
        ),
    }
    # rng was split from the replicated state rng with no device fold —
    # identical on every chip by construction
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        occupancy=state.occupancy,
        rng=rng,
    )
    return new_state, metrics


@partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "sample_cap", "pack_cap"),
    donate_argnames=("state",),
)
def sharded_train_step(
    state: TrainState,
    data: Batch,
    cfg: Config,
    mesh: Mesh,
    sample_cap: int,
    pack_cap: int | None = None,
):
    """Multi-chip train step — drop-in for ``train/step.py:train_step``.

    ``metrics["counts_max"]``/``rm_samples`` keep their single-chip
    meaning (global max / global sum) so the host's adaptive
    sample/pack-bucket logic (train/loop.py) works unchanged.

    ``pack_cap`` is the GLOBAL packed-eval budget; each chip gets a
    per-shard slice (global / n_dev, +50% headroom for ray-count skew,
    pow2-ish bucketed) so the dominant field-eval phase scales with the
    shard, not the whole batch.  Parity note: single == multi is exact
    while no cap truncates (the equivalence tests pin that regime); when
    samples exceed the budget, per-shard truncation drops each shard's
    trailing samples rather than the global batch's trailing rays.
    """
    n_dev = mesh.devices.size
    assert cfg.train.batch_size % n_dev == 0, (
        f"batch_size {cfg.train.batch_size} not divisible by "
        f"{n_dev} devices"
    )
    if pack_cap is not None:
        from ..train.loop import _bucket

        local_dense = (cfg.train.batch_size // n_dev) * sample_cap
        pack_cap = min(_bucket(int(1.5 * pack_cap / n_dev)), local_dense)
        if pack_cap >= local_dense:
            pack_cap = None  # dense eval is cheaper than full-size packing
    local = partial(
        _local_train_step,
        cfg=cfg,
        sample_cap=sample_cap,
        pack_cap=pack_cap,
        n_dev=n_dev,
    )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(_STATE_SPECS, P()),
        out_specs=(_STATE_SPECS, P()),
        check_vma=False,
    )
    return fn(state, data)


@partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "warmup"),
    donate_argnames=("state",),
)
def _sharded_density_step_impl(
    state: TrainState, all_cells, cfg: Config, mesh: Mesh, warmup: bool
) -> TrainState:
    n_dev = mesh.devices.size

    def local(state: TrainState, all_cells):
        rng, key = jax.random.split(state.rng)
        dev = jax.lax.axis_index(DATA_AXIS)
        occupancy = update_density_grid(
            state.params,
            cfg.model,
            get_model(cfg.model.name).density,
            state.occupancy,
            key,
            cfg.train.density_threshold(),
            warmup=warmup,
            decay=cfg.train.density_decay,
            all_cells=all_cells,
            cell_shard=(dev, n_dev),
            tmp_reduce=lambda t: jax.lax.pmax(t, DATA_AXIS),
        )
        return TrainState(
            params=state.params,
            opt_state=state.opt_state,
            occupancy=occupancy,
            rng=rng,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(_STATE_SPECS, (P(), P())),
        out_specs=_STATE_SPECS,
        check_vma=False,
    )
    return fn(state, all_cells)


_ALL_CELLS_MESH: dict = {}


def sharded_density_grid_step(
    state: TrainState, cfg: Config, mesh: Mesh, warmup: bool
) -> TrainState:
    """Multi-chip occupancy refresh — drop-in for
    ``train/step.py:density_grid_step`` (same key spine, bitwise-equal
    result; each chip evaluates 1/n_devices of the probe cells)."""
    from ..models.occupancy import _all_cells

    g = cfg.model.grid_size
    # key by stable device identity, not id(mesh): a GC'd Mesh's address can
    # be reused by a different mesh, resurrecting arrays with a dead sharding
    cache_key = (g, tuple(d.id for d in mesh.devices.flat))
    if cache_key not in _ALL_CELLS_MESH:
        coords_np, indices_np = _all_cells(g)
        repl = NamedSharding(mesh, P())
        _ALL_CELLS_MESH[cache_key] = (
            jax.device_put(jnp.asarray(coords_np), repl),
            jax.device_put(jnp.asarray(indices_np), repl),
        )
    return _sharded_density_step_impl(
        state, _ALL_CELLS_MESH[cache_key], cfg, mesh, warmup
    )


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place (replicate) a train state onto the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def shard_batch(data: Batch, mesh: Mesh) -> Batch:
    repl = NamedSharding(mesh, P())
    return jax.device_put(data, repl)


def make_sharded_train_step(cfg: Config, mesh: Mesh, sample_cap: int):
    """Back-compat builder: returns ``fn(state, data)`` bound to one
    sample cap (prefer calling :func:`sharded_train_step` directly)."""
    return lambda state, data: sharded_train_step(
        state, data, cfg, mesh, sample_cap
    )
