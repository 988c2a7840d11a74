"""Occupancy (density) grid maintenance — TPU-native.

Rebuild of the reference's grid machinery on ``NGP``
(``modules/networks.py:168-290``): cascaded 128^3 morton-indexed density
grid, camera-visibility marking, EMA density refresh on a mix of uniform and
occupied cells, and bitfield packing.  Everything is fixed-shape and
jit-compatible:

* "sample M random occupied cells" (``networks.py:181-209``, a dynamic
  ``nonzero``) becomes a categorical draw over the occupancy mask — the same
  uniform-with-replacement distribution, static shapes;
* density inference over sampled cells is chunked with ``lax.map`` (the
  reference chunks with a Python loop, ``networks.py:229``);
* duplicate scatter writes use a deterministic max (the reference's
  overwrite order is GPU-nondeterministic).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import NEAR_DISTANCE, ModelConfig
import functools
import numpy as np

from ..ops.math import (
    grid_coords_np,
    morton3d,
    morton3d_invert,
    morton3d_np,
    packbits_u32,
)


class OccupancyGrid(NamedTuple):
    density_grid: jnp.ndarray  # (cascades, G**3) f32, morton-indexed
    count_grid: jnp.ndarray  # (cascades, G**3) f32 camera-coverage counts
    bitfield: jnp.ndarray  # (cascades * G**3 // 32,) uint32


def init_occupancy(cfg: ModelConfig) -> OccupancyGrid:
    c, g3 = cfg.cascades, cfg.grid_size**3
    return OccupancyGrid(
        density_grid=jnp.zeros((c, g3), jnp.float32),
        count_grid=jnp.zeros((c, g3), jnp.float32),
        bitfield=jnp.zeros((c * g3 // 32,), jnp.uint32),
    )


@functools.lru_cache(maxsize=4)
def _all_cells(grid_size: int):
    """All cell (coords, morton indices), precomputed host-side in numpy —
    a 2M-element literal, not a foldable bit-op chain (XLA would spend
    minutes constant-folding the traced version at G=128)."""
    coords = grid_coords_np(grid_size)
    return coords, morton3d_np(coords)


def _cascade_scale(c: int, scale: float) -> float:
    # reference: networks.py:231,270 — cascade c covers [-2^(c-1), 2^(c-1)]^3
    return min(2.0 ** (c - 1), scale)


def _chunked(fn: Callable, x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Apply ``fn`` over the leading axis in fixed-size chunks via lax.map.

    When the input fits in one chunk (the TPU path — HBM handles millions
    of samples in one fused call) the loop disappears entirely.
    """
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    out = jax.lax.map(fn, x.reshape(-1, chunk, *x.shape[1:]))
    return out.reshape(-1, *out.shape[2:])[:n]


def mark_invisible_cells(
    cfg: ModelConfig,
    K: jnp.ndarray,
    poses: jnp.ndarray,
    img_wh,
    chunk: int = 32**3,
) -> OccupancyGrid:
    """Mark camera-invisible cells with density -1 (networks.py:211-253).

    Args:
        K: (3, 3) intrinsics.
        poses: (N_cams, 3, 4) camera-to-world.
        img_wh: (W, H).
    """
    g = cfg.grid_size
    n_cams = poses.shape[0]
    w2c_r = jnp.swapaxes(poses[:, :3, :3], 1, 2)  # (N, 3, 3)
    w2c_t = -jnp.einsum("nij,nj->ni", w2c_r, poses[:, :3, 3])  # (N, 3)
    coords_np, indices_np = _all_cells(g)  # host-side static literals
    indices = jnp.asarray(indices_np)
    xyzs = jnp.asarray(coords_np, jnp.float32) / (g - 1) * 2.0 - 1.0

    density_grid = []
    count_grid = []
    for c in range(cfg.cascades):
        s = _cascade_scale(c, cfg.scale)
        half_grid_size = s / g

        def body(xyz_chunk):
            xyzs_w = xyz_chunk * (s - half_grid_size)  # (M, 3)
            xyzs_c = (
                jnp.einsum("nij,mj->nmi", w2c_r, xyzs_w) + w2c_t[:, None, :]
            )  # (N, M, 3)
            uvd = jnp.einsum("ij,nmj->nmi", K, xyzs_c)
            d = uvd[..., 2]
            uv = uvd[..., :2] / d[..., None]
            in_image = (
                (d >= 0)
                & (uv[..., 0] >= 0)
                & (uv[..., 0] < img_wh[0])
                & (uv[..., 1] >= 0)
                & (uv[..., 1] < img_wh[1])
            )
            covered = (d >= NEAR_DISTANCE) & in_image
            count = jnp.sum(covered, axis=0) / n_cams
            too_near = jnp.any((d < NEAR_DISTANCE) & in_image, axis=0)
            valid = (count > 0) & (~too_near)
            return count, jnp.where(valid, 0.0, -1.0)

        n = xyzs.shape[0]
        pad = (-n) % chunk
        xp = jnp.concatenate([xyzs, jnp.zeros((pad, 3), jnp.float32)])
        count_c, dens_c = jax.lax.map(body, xp.reshape(-1, chunk, 3))
        count_c = count_c.reshape(-1)[:n]
        dens_c = dens_c.reshape(-1)[:n]
        # scatter back into morton order
        count_grid.append(jnp.zeros(g**3, jnp.float32).at[indices].set(count_c))
        density_grid.append(
            jnp.zeros(g**3, jnp.float32).at[indices].set(dens_c)
        )

    c, g3 = cfg.cascades, g**3
    return OccupancyGrid(
        density_grid=jnp.stack(density_grid),
        count_grid=jnp.stack(count_grid),
        bitfield=jnp.zeros((c * g3 // 32,), jnp.uint32),
    )


def update_density_grid(
    params,
    cfg: ModelConfig,
    density_fn: Callable,
    grid: OccupancyGrid,
    key: jax.Array,
    density_threshold: float,
    warmup: bool,
    decay: float = 0.95,
    erode: bool = False,
    chunk: int = 4 * 1024 * 1024,
    all_cells: tuple | None = None,
    cell_shard: tuple | None = None,
    tmp_reduce=None,
) -> OccupancyGrid:
    """EMA density refresh + bitfield repack (reference: networks.py:255-290).

    Args:
        density_fn: ``(params, cfg, xyz) -> sigma``.
        warmup: static — all cells during the first 256 steps
            (train.py:57,178-182), else G^3/4 uniform + G^3/4 occupied.
        all_cells: optional (coords, indices) device arrays for the warmup
            path.  Pass these as *runtime* arguments — embedding the 2M-cell
            tables as HLO literals OOM-kills the XLA compile helper.
        cell_shard: optional ``(shard_idx, n_shards)`` — evaluate only the
            ``shard_idx``-th 1/n_shards slice of each cascade's sampled
            cells (the multi-chip grid refresh: every chip draws the SAME
            cell set + jitter from the shared key, takes a disjoint slice,
            and the partial ``tmp`` grids max-reduce with ``tmp_reduce``).
            The union over shards equals the single-chip evaluation
            exactly, so sharded == single-chip bitwise.
        tmp_reduce: optional fn applied to the scatter-max density probe
            grid before the EMA merge (multi-chip: ``lax.pmax`` over the
            data axis).
    """
    g = cfg.grid_size
    g3 = g**3
    tmp = jnp.zeros_like(grid.density_grid)

    for c in range(cfg.cascades):
        key, k_u, k_o, k_n = jax.random.split(key, 4)
        if warmup:
            if all_cells is not None:
                coords, indices = all_cells
            else:
                coords_np, indices_np = _all_cells(g)
                coords = jnp.asarray(coords_np)
                indices = jnp.asarray(indices_np)
        else:
            m = g3 // 4
            coords1 = jax.random.randint(
                k_u, (m, 3), 0, g, dtype=jnp.int32
            )
            indices1 = morton3d(coords1)
            occ_mask = grid.density_grid[c] > density_threshold
            # uniform draw over occupied cells as top-m random keys
            # (without replacement).  A categorical over the mask
            # broadcasts an (m, g^3) Gumbel tensor — 4.7 s/refresh at the
            # flagship 128^3 config (measured on v5e); this is one
            # uniform + one top_k.  The reference draws occupied cells
            # WITH replacement (networks.py:181-209) — coverage here is
            # the same or better.
            r = jax.random.uniform(k_o, (g3,))
            _, sampled = jax.lax.top_k(jnp.where(occ_mask, r, -1.0), m)
            has_occ = jnp.any(occ_mask)
            indices2 = jnp.where(has_occ, sampled.astype(jnp.int32), indices1)
            coords2 = morton3d_invert(indices2)
            indices = jnp.concatenate([indices1, indices2])
            coords = jnp.concatenate([coords1, coords2])

        s = _cascade_scale(c, cfg.scale)
        half_grid_size = s / g
        xyzs_w = (coords.astype(jnp.float32) / (g - 1) * 2.0 - 1.0) * (
            s - half_grid_size
        )
        # jitter drawn at full size BEFORE any shard slice so every shard
        # sees the same per-cell perturbation as the single-chip path
        noise = jax.random.uniform(
            k_n, xyzs_w.shape, minval=-1.0, maxval=1.0
        )
        xyzs_w = xyzs_w + noise * half_grid_size

        if cell_shard is not None:
            shard_idx, n_shards = cell_shard
            n_cells = xyzs_w.shape[0]
            assert n_cells % n_shards == 0, (
                f"{n_cells} cells not divisible by {n_shards} shards"
            )
            k = n_cells // n_shards
            start = jnp.asarray(shard_idx, jnp.int32) * k
            xyzs_w = jax.lax.dynamic_slice_in_dim(xyzs_w, start, k)
            indices = jax.lax.dynamic_slice_in_dim(indices, start, k)

        sigmas = _chunked(
            lambda x: density_fn(params, cfg, x), xyzs_w, chunk
        )
        tmp = tmp.at[c, indices].max(sigmas)

    if tmp_reduce is not None:
        tmp = tmp_reduce(tmp)
    if erode:
        # decay more the cells seen by few cameras (networks.py:278-280)
        decay_arr = jnp.clip(
            decay ** (1.0 / jnp.maximum(grid.count_grid, 1e-6)), 0.1, 0.95
        )
    else:
        decay_arr = decay
    density_grid = jnp.where(
        grid.density_grid < 0,
        grid.density_grid,
        jnp.maximum(grid.density_grid * decay_arr, tmp),
    )

    positive = density_grid > 0
    mean_density = jnp.sum(jnp.where(positive, density_grid, 0.0)) / jnp.maximum(
        jnp.sum(positive), 1
    )
    threshold = jnp.minimum(mean_density, density_threshold)
    bitfield = packbits_u32(density_grid.reshape(-1), threshold)
    return OccupancyGrid(
        density_grid=density_grid,
        count_grid=grid.count_grid,
        bitfield=bitfield,
    )
