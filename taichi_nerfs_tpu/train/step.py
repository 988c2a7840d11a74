"""The fused training step — one XLA program per step.

Where the reference crosses the PyTorch<->Taichi boundary ~13 times per step
(SURVEY §3.1), here ray-batch sampling, ray generation, AABB intersect,
occupancy marching, field eval, compositing, losses, backward, and the Adam
update are a single jitted, donated computation (reference flow:
``train.py:168-201``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.registry import get_model
from ..models.occupancy import update_density_grid
from ..ops.distortion import distortion_loss
from ..ops.rays import get_rays
from ..render.renderer import render_train
from .state import TrainState, make_optimizer


class Batch(NamedTuple):
    """Device-resident training data (reference: datasets/base.py:27-32)."""

    rays: jnp.ndarray  # (N_img, H*W, 3) rgb
    poses: jnp.ndarray  # (N_img, 3, 4)
    directions: jnp.ndarray  # (H*W, 3) camera-frame ray dirs


def sample_batch(
    key: jax.Array, data: Batch, batch_size: int, strategy: str
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random (image, pixel) ray batch (reference: datasets/base.py:34-61)."""
    k_img, k_pix = jax.random.split(key)
    n_img, n_pix = data.rays.shape[0], data.rays.shape[1]
    if strategy == "all_images":
        img_idxs = jax.random.randint(k_img, (batch_size,), 0, n_img)
    elif strategy == "same_image":
        img_idxs = jnp.broadcast_to(
            jax.random.randint(k_img, (1,), 0, n_img), (batch_size,)
        )
    else:
        raise ValueError(strategy)
    pix_idxs = jax.random.randint(k_pix, (batch_size,), 0, n_pix)
    rgb = data.rays[img_idxs, pix_idxs]
    pose = data.poses[img_idxs]
    direction = data.directions[pix_idxs]
    return rgb, pose, direction


@partial(
    jax.jit,
    static_argnames=("cfg", "sample_cap", "pack_cap"),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    data: Batch,
    cfg: Config,
    sample_cap: int,
    pack_cap: int | None = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    """One optimizer step (reference: train.py:168-201)."""
    rng, k_batch, k_render = jax.random.split(state.rng, 3)
    rgb_gt, pose, direction = sample_batch(
        k_batch, data, cfg.train.batch_size, cfg.train.ray_sampling_strategy
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
            pack_cap,
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
    optimizer = make_optimizer(cfg)
    updates, opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)

    mse = jnp.mean((results["rgb"] - rgb_gt) ** 2)
    metrics = {
        "loss": loss,
        "psnr": -10.0 * jnp.log10(mse),
        "rm_samples": results["rm_samples"],
        "vr_samples": results["vr_samples"],
        "counts_max": jnp.max(results["counts"]),
    }
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        occupancy=state.occupancy,
        rng=rng,
    )
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg", "warmup"), donate_argnames=("state",))
def _density_grid_step_impl(
    state: TrainState, all_cells, cfg: Config, warmup: bool
) -> TrainState:
    rng, key = jax.random.split(state.rng)
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
    )
    return TrainState(
        params=state.params,
        opt_state=state.opt_state,
        occupancy=occupancy,
        rng=rng,
    )


_ALL_CELLS_DEVICE: dict = {}


def density_grid_step(
    state: TrainState, cfg: Config, warmup: bool
) -> TrainState:
    """Scheduled occupancy-grid refresh (reference: train.py:178-182).

    The all-cells table rides in as a runtime argument (cached on device)
    so the warmup program's HLO stays literal-free.
    """
    from ..models.occupancy import _all_cells

    g = cfg.model.grid_size
    if g not in _ALL_CELLS_DEVICE:
        coords_np, indices_np = _all_cells(g)
        _ALL_CELLS_DEVICE[g] = (
            jnp.asarray(coords_np),
            jnp.asarray(indices_np),
        )
    return _density_grid_step_impl(
        state, _ALL_CELLS_DEVICE[g], cfg, warmup
    )
