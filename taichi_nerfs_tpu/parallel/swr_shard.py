"""Multi-chip training for the dense shear-warp path: crop-parallel DP.

Capability extension (the reference has no distributed support, SURVEY
§2.4).  Layout:

* pyramid params / optimizer state: **replicated**;
* the per-step work unit is a training *crop*; each chip renders its own
  (image, crop) draw — crops, poses, intrinsics are **sharded** over the
  ``data`` mesh axis;
* gradients and metrics reduce with ``pmean`` over ICI; the optimizer
  update replays identically on every chip, keeping params replicated.

The bake is recomputed per chip (dense streaming, no communication) —
cheaper than baking once and all-gathering the 0.5 GB fused grid.

One constraint carried over from the single-chip path: the sweep
axis/direction is *static* per compiled program, so a batch groups crops
from poses that share (axis, flip).  ``SwrShardedSampler`` draws batches
that way (synthetic-NeRF rigs cluster heavily by dominant axis).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import pyramid as pyr
from ..train.swr_step import (
    SwrTrainConfig,
    SwrTrainState,
    make_optimizer,
    make_swr_loss,
)
from .mesh import DATA_AXIS


def make_swr_sharded_step(
    mcfg: pyr.PyramidConfig,
    tcfg: SwrTrainConfig,
    mesh: Mesh,
    axis: int,
    flip: bool,
    slab_window: int = 0,
    warp: str = "matmul",
    inside: bool = False,
    lat_size: int = 0,
    with_sigma_keep: bool = False,
    with_slope_bounds: bool = False,
):
    """Jitted shard_map'd SWR train step: one crop per chip.

    Inputs per call (leading dim = n_devices, sharded over ``data``):
      images (D, H, W, 3), poses (D, 3, 4), Ks (D, 3, 3),
      crop_xy (D, 2) int32.

    ``inside`` trains a cubemap face of inside-the-grid cameras — the
    host must group the batch by face, since (axis, flip, warp) are
    static per program (same constraint as the outside sweep).  The
    optional trailing operands (enabled at build time so the call
    signature stays positional):

    * ``with_sigma_keep``: one replicated (R, R, R) camera free-space
      carving mask (``train/swr_step.camera_keep_mask``) appended after
      ``crop_xy`` — passed per call rather than closed over so the grid
      isn't baked into the executable as a constant;
    * ``with_slope_bounds``: per-crop (D, 2, 2) tight slope bounds
      (``render/swr.face_slope_bounds``), sharded like the crops.
    """
    optimizer = make_optimizer(tcfg)

    def local_step(
        state: SwrTrainState,
        image: jnp.ndarray,  # (1, H, W, 3) local shard
        pose: jnp.ndarray,  # (1, 3, 4)
        K: jnp.ndarray,  # (1, 3, 3)
        crop_xy: jnp.ndarray,  # (1, 2)
        *extra: jnp.ndarray,
    ) -> Tuple[SwrTrainState, Dict[str, jnp.ndarray]]:
        it = iter(extra)
        sigma_keep = next(it) if with_sigma_keep else None
        slope_bounds = next(it)[0] if with_slope_bounds else None
        dev = jax.lax.axis_index(DATA_AXIS)
        rng, k_tv = jax.random.split(jax.random.fold_in(state.rng, dev))
        loss_fn = make_swr_loss(
            image[0], pose[0], K[0], crop_xy[0], k_tv, mcfg, tcfg,
            axis, flip, slab_window, lat_size, inside, warp,
            sigma_keep, slope_bounds,
        )
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        mse = jax.lax.pmean(mse, DATA_AXIS)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        # keep the carried rng identical across chips
        rng0 = jax.lax.all_gather(rng, DATA_AXIS)[0]
        metrics = {"loss": loss, "psnr": -10.0 * jnp.log10(mse)}
        return SwrTrainState(params, opt_state, rng0), metrics

    state_specs = SwrTrainState(params=P(), opt_state=P(), rng=P())
    data_spec = P(DATA_AXIS)
    extra_specs = ()
    if with_sigma_keep:
        extra_specs += (P(),)  # replicated
    if with_slope_bounds:
        extra_specs += (data_spec,)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, data_spec, data_spec, data_spec, data_spec)
        + extra_specs,
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_swr_state(state: SwrTrainState, mesh: Mesh) -> SwrTrainState:
    """Replicate an SWR train state onto the mesh."""
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_swr_batch(mesh: Mesh, *arrays):
    """Place per-device-stacked arrays (leading dim = n_devices)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)
