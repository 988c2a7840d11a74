"""Multiresolution hash-grid encoder — TPU-native.

Rebuild of the reference's Taichi hash encoder
(``modules/hash_encoder.py:14-285``) as a pure-jnp gather pipeline:

* the per-level 8-corner trilinear gather becomes a batched ``take`` from a
  ``(n_entries, F)`` table (XLA lowers this to TPU gathers);
* the backward scatter-add of table gradients — which the reference implements
  twice, once via Taichi reverse-mode AD (fp32) and once as hand-written
  atomics (``hash_encoder_half.py:164-213``) — falls out of XLA's autodiff
  (the transpose of gather is scatter-add), with deterministic results;
* level geometry (resolutions, offsets, hash switch-over) is Python-static so
  the whole encode unrolls into 16 fused gather+FMA stages under ``jit``.

Parity notes: same level sizing (``align_to(res^3, 8)`` capped at ``2**log2_T``,
``hash_encoder.py:183-207``), same spatial hash (primes 1 / 2654435761 /
805459861, ``:43-51``), same linear "under hash" for dense levels (``:53-60``),
same U[0,1] table init (``:220-227``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HashGridConfig

_PRIMES = (1, 2654435761, 805459861)


def _align_to(x: int, y: int) -> int:
    # reference: modules/utils.py:41-42
    return int((x + y - 1) // y) * y


def _res_in_level(level: int, base_res: float, log_b: float) -> int:
    # reference: modules/utils.py:19-29
    return int(np.ceil(float(base_res) * np.exp(level * log_b) - 1.0)) + 1


@dataclasses.dataclass(frozen=True)
class HashGridLayout:
    """Static level geometry derived from a HashGridConfig."""

    levels: int
    feature_per_level: int
    base_res: float
    log_b: float
    resolutions: Tuple[int, ...]
    map_sizes: Tuple[int, ...]
    offsets: Tuple[int, ...]
    begin_fast_hash_level: int
    n_entries: int  # total table rows (features are columns)

    @property
    def out_dim(self) -> int:
        return self.levels * self.feature_per_level


def build_layout(cfg: HashGridConfig) -> HashGridLayout:
    """Level table sizing (reference: modules/hash_encoder.py:183-207)."""
    max_params = 2**cfg.log2_T
    offsets: List[int] = []
    map_sizes: List[int] = []
    resolutions: List[int] = []
    offset = 0
    begin_fast_hash_level = cfg.levels
    for i in range(cfg.levels):
        res = _res_in_level(i, cfg.base_res, cfg.log_b)
        full_size = res**3
        full_size_aligned = _align_to(full_size, 8)
        params_size = min(max_params, full_size_aligned)
        offsets.append(offset)
        map_sizes.append(params_size)
        resolutions.append(res)
        if full_size > params_size and begin_fast_hash_level == cfg.levels:
            begin_fast_hash_level = i
        offset += params_size
    return HashGridLayout(
        levels=cfg.levels,
        feature_per_level=cfg.feature_per_level,
        base_res=float(cfg.base_res),
        log_b=cfg.log_b,
        resolutions=tuple(resolutions),
        map_sizes=tuple(map_sizes),
        offsets=tuple(offsets),
        begin_fast_hash_level=begin_fast_hash_level,
        n_entries=offset,
    )


def init_hash_table(key: jax.Array, layout: HashGridLayout) -> jnp.ndarray:
    """U[0,1] init, as the reference's ``torch.nn.init.uniform_`` default
    (modules/hash_encoder.py:220-227).  Shape (n_entries, F)."""
    return jax.random.uniform(
        key, (layout.n_entries, layout.feature_per_level), dtype=jnp.float32
    )


def _fast_hash(coords: jnp.ndarray) -> jnp.ndarray:
    """XOR-multiply spatial hash (reference: hash_encoder.py:43-51)."""
    result = coords[..., 0] * jnp.uint32(_PRIMES[0])
    result = result ^ (coords[..., 1] * jnp.uint32(_PRIMES[1]))
    result = result ^ (coords[..., 2] * jnp.uint32(_PRIMES[2]))
    return result


def _under_hash(coords: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Dense linear index (reference: hash_encoder.py:53-60)."""
    r = jnp.uint32(resolution)
    return coords[..., 0] + coords[..., 1] * r + coords[..., 2] * r * r


def hash_encode(
    table: jnp.ndarray, xyz: jnp.ndarray, layout: HashGridLayout
) -> jnp.ndarray:
    """Encode normalized positions through the multiresolution hash grid.

    Args:
        table: (n_entries, F) float table.
        xyz: (..., 3) positions normalized to [0, 1].
        layout: static level geometry.
    Returns:
        (..., levels * F) features, level-major like the reference
        (``hash_encoder.py:141-143``).
    """
    feats = []
    compute_dtype = table.dtype
    for level in range(layout.levels):
        scale = layout.base_res * math.exp(level * layout.log_b) - 1.0
        res = layout.resolutions[level]
        map_size = layout.map_sizes[level]
        offset = layout.offsets[level]

        pos = xyz * jnp.float32(scale) + 0.5
        pos_grid = jnp.floor(pos)
        frac = (pos - pos_grid).astype(compute_dtype)
        pos_grid = pos_grid.astype(jnp.uint32)

        acc = None
        for corner in range(8):
            sel = jnp.asarray(
                [(corner >> d) & 1 for d in range(3)], jnp.uint32
            )
            cxyz = pos_grid + sel
            w = jnp.ones(xyz.shape[:-1], compute_dtype)
            for d in range(3):
                w = w * jnp.where(
                    (corner >> d) & 1, frac[..., d], 1.0 - frac[..., d]
                )
            if level < layout.begin_fast_hash_level:
                h = _under_hash(cxyz, res)
            else:
                h = _fast_hash(cxyz)
            idx = (h % jnp.uint32(map_size)).astype(jnp.int32) + offset
            f = jnp.take(table, idx, axis=0)  # (..., F)
            term = w[..., None] * f
            acc = term if acc is None else acc + term
        feats.append(acc)
    return jnp.concatenate(feats, axis=-1)
