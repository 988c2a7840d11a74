"""Train- and test-time rendering pipelines — TPU-native.

Rebuild of ``modules/rendering.py``.  The train path is one fused jit graph:
AABB intersect -> occupancy march -> field eval -> masked composite -> bg
blend.  The test path replaces the reference's *host-driven* alive-ray loop
(``rendering.py:96-144``, a device->host counter readback per iteration) with
an on-device ``lax.while_loop``: each round marches a fixed segment of
samples for every ray, evaluates the field, and composites incrementally;
converged/exhausted rays are masked out (no compaction needed — lanes are
cheap, host syncs are not).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config, ModelConfig, RenderConfig
from ..models.registry import get_model
from ..ops.composite import (
    apply_background,
    composite_test_round,
    composite_train,
)
from ..ops.marching import (
    march_rays,
    perturb_t_start,
    sample_positions,
    valid_mask,
)
from ..ops.rays import ray_aabb_intersect


def _background(
    rcfg: RenderConfig, key: jax.Array | None, shape
) -> jnp.ndarray:
    if rcfg.random_bg and key is not None:
        return jax.random.uniform(key, shape)
    if rcfg.white_bg:
        return jnp.ones(shape, jnp.float32)
    return jnp.zeros(shape, jnp.float32)


def render_train(
    params,
    mcfg: ModelConfig,
    rcfg: RenderConfig,
    bitfield: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    sample_cap: int,
) -> Dict[str, jnp.ndarray]:
    """Differentiable train-time render (reference: rendering.py:161-228).

    Returns a dict mirroring the reference's ``results`` (rgb, opacity,
    depth, ws, deltas, ts, rm_samples, vr_samples) in dense (N, S) layout.
    """
    n = rays_o.shape[0]
    k_noise, k_bg = jax.random.split(key)
    hits_t = ray_aabb_intersect(rays_o, rays_d, mcfg.scale)
    noise = jax.random.uniform(k_noise, (n,))
    t_start = perturb_t_start(
        hits_t, noise, rcfg.exp_step_factor, mcfg.grid_size, mcfg.scale
    )
    march = march_rays(
        rays_o,
        rays_d,
        t_start,
        hits_t[:, 1],
        bitfield,
        cascades=mcfg.cascades,
        scale=mcfg.scale,
        exp_step_factor=rcfg.exp_step_factor,
        grid_size=mcfg.grid_size,
        sample_cap=sample_cap,
    )
    valid = valid_mask(march.counts, sample_cap)
    xyzs = sample_positions(rays_o, rays_d, march.ts)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    sigmas, rgbs = get_model(mcfg.name).forward(params, mcfg, xyzs, dirs)
    comp = composite_train(
        sigmas, rgbs, march.deltas, march.ts, valid, rcfg.t_threshold
    )
    rgb_bg = _background(rcfg, k_bg, (3,))
    rgb = apply_background(comp.rgb, comp.opacity, rgb_bg)
    return {
        "rgb": rgb,
        "opacity": comp.opacity,
        "depth": comp.depth,
        "ws": comp.ws,
        "deltas": march.deltas,
        "ts": march.ts,
        "valid": valid,
        "counts": march.counts,
        "rm_samples": jnp.sum(march.counts),
        "vr_samples": comp.vr_samples,
    }


@partial(jax.jit, static_argnames=("mcfg", "rcfg"))
def render_test_chunk(
    params,
    mcfg: ModelConfig,
    rcfg: RenderConfig,
    bitfield: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Test-time render of one ray chunk (reference: rendering.py:61-158).

    On-device round loop: march ``rcfg.test_chunk_samples`` samples per
    alive ray, evaluate, composite, mask converged rays; stop when all rays
    are dead or the per-ray budget (``rcfg.max_samples``) is spent.
    """
    n = rays_o.shape[0]
    s_seg = rcfg.test_chunk_samples
    max_rounds = max(rcfg.max_samples // s_seg, 1)

    hits_t = ray_aabb_intersect(rays_o, rays_d, mcfg.scale)
    t_cur = hits_t[:, 0]
    t_end = hits_t[:, 1]

    def cond(state):
        rnd, _, alive, *_ = state
        return (rnd < max_rounds) & jnp.any(alive)

    # per-round probe window: wide enough that a round rarely comes home
    # empty-handed, small enough to keep the probe cheap
    window = max(8 * s_seg, 256)

    def body(state):
        rnd, t_cur, alive, opacity, depth, rgb, total = state
        t_in = jnp.where(alive, t_cur, -1.0)
        march = march_rays(
            rays_o,
            rays_d,
            t_in,
            t_end,
            bitfield,
            cascades=mcfg.cascades,
            scale=mcfg.scale,
            exp_step_factor=rcfg.exp_step_factor,
            grid_size=mcfg.grid_size,
            sample_cap=s_seg,
            n_candidates=window,
        )
        valid = valid_mask(march.counts, s_seg)
        xyzs = sample_positions(rays_o, rays_d, march.ts)
        dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
        sigmas, rgbs = get_model(mcfg.name).forward(params, mcfg, xyzs, dirs)
        sigmas = jnp.where(valid, sigmas, 0.0)
        opacity, depth, rgb, converged = composite_test_round(
            sigmas,
            rgbs,
            march.deltas,
            march.ts,
            valid,
            rcfg.t_threshold,
            opacity,
            depth,
            rgb,
        )
        # kill rays that exhausted the AABB or converged
        # (reference: rendering.py:143-144, volume_render_test.py:29-37)
        alive = alive & (march.t_final < t_end) & (~converged)
        t_cur = jnp.where(alive, march.t_final, t_cur)
        total = total + jnp.sum(march.counts)
        return rnd + 1, t_cur, alive, opacity, depth, rgb, total

    init = (
        jnp.int32(0),
        t_cur,
        t_cur >= 0.0,
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n, 3), jnp.float32),
        jnp.int32(0),
    )
    _, _, _, opacity, depth, rgb, total = jax.lax.while_loop(cond, body, init)

    rgb_bg = _background(rcfg, None, (3,))
    rgb = apply_background(rgb, opacity, rgb_bg)
    return {
        "rgb": rgb,
        "opacity": opacity,
        "depth": depth,
        "total_samples": total,
    }


def render_image(
    params,
    cfg: Config,
    bitfield: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    chunk: int = 65536,
) -> Dict[str, jnp.ndarray]:
    """Full-image test render in fixed-size ray chunks."""
    n = rays_o.shape[0]
    pad = (-n) % chunk
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.ones((pad, 3))], axis=0)
        rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3))], axis=0)
    outs = []
    for i in range(0, n + pad, chunk):
        outs.append(
            render_test_chunk(
                params,
                cfg.model,
                cfg.render,
                bitfield,
                rays_o[i : i + chunk],
                rays_d[i : i + chunk],
            )
        )
    res = {
        k: jnp.concatenate([o[k] for o in outs])[:n]
        for k in ("rgb", "opacity", "depth")
    }
    res["total_samples"] = sum(o["total_samples"] for o in outs)
    return res
