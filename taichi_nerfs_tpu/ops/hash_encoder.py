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
    table_dtype: str = "float32"  # compute dtype (half2 analogue)

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
        table_dtype=getattr(cfg, "table_dtype", "float32"),
    )


def init_hash_table(key: jax.Array, layout: HashGridLayout) -> jnp.ndarray:
    """U[0,1] init, as the reference's ``torch.nn.init.uniform_`` default
    (modules/hash_encoder.py:220-227).

    Shape (F, n_entries) — feature-major, so each feature channel is one
    flat, perfectly-tiled gather target (the reference interleaves features
    per entry, ``hash_encoder.py:134-136``; the export path transposes
    back)."""
    return jax.random.uniform(
        key, (layout.feature_per_level, layout.n_entries), dtype=jnp.float32
    )


@jax.custom_vjp
def _gather_pair_bf16(table: jnp.ndarray, idx: jnp.ndarray):
    """One u32 row-gather fetches BOTH bf16 feature channels of a corner.

    TPU random access is issue-rate-bound per ROW, not per byte
    (``ops/brick_encoder.py`` docstring: scalar and 64 B-row gathers both
    run ~75-100 M rows/s on v5e), so the per-feature scalar gathers of the
    bf16 table path pay 2x the issue slots for the same bytes.  Packing the
    two bf16 channels of each table entry into one uint32 word makes the
    encode ONE gather per (level, corner) slot; the channels unpack
    in-register by bitcast (bf16 -> f32 widening is exactly ``bits << 16``),
    so the forward is bit-identical to gathering the bf16 channels and
    widening them.  This is the TPU shape of the reference's half2 fast
    path (``modules/hash_encoder_half.py:104-162``: one 32-bit half2 load
    per corner).

    Args:
        table: (2, n_entries) bfloat16.
        idx: (..., ) int32 row indices.
    Returns:
        (f0, f1): float32 arrays of idx's shape — the widened channels.
    """
    lo = jax.lax.bitcast_convert_type(table[0], jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(table[1], jnp.uint16).astype(jnp.uint32)
    packed = lo | (hi << jnp.uint32(16))
    g = jnp.take(packed, idx, axis=0)
    f0 = jax.lax.bitcast_convert_type(g << jnp.uint32(16), jnp.float32)
    f1 = jax.lax.bitcast_convert_type(
        g & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return f0, f1


def _gather_pair_fwd(table, idx):
    return _gather_pair_bf16(table, idx), (idx, table.shape[1])


def _gather_pair_bwd(res, dout):
    idx, n = res
    df0, df1 = dout
    flat = idx.reshape(-1)
    # accumulate in f32 (the cast to the table's bf16 dtype happens once,
    # after the adds — the reference's fp16 atomics accumulate at storage
    # width; f32 here is strictly tighter)
    d0 = jnp.zeros((n,), jnp.float32).at[flat].add(df0.reshape(-1))
    d1 = jnp.zeros((n,), jnp.float32).at[flat].add(df1.reshape(-1))
    return jnp.stack([d0, d1]).astype(jnp.bfloat16), None


_gather_pair_bf16.defvjp(_gather_pair_fwd, _gather_pair_bwd)


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

    Fully vectorized over (levels x 8 corners): the whole encode is ONE
    gather from the table, and its autodiff transpose is ONE scatter-add —
    a per-level/per-corner formulation (128 separate gathers) makes XLA's
    backward-pass compile take minutes and can OOM the compiler.

    Args:
        table: (n_entries, F) float table.
        xyz: (..., 3) positions normalized to [0, 1].
        layout: static level geometry.
    Returns:
        (..., levels * F) features, level-major like the reference
        (``hash_encoder.py:141-143``).
    """
    L = layout.levels
    F = layout.feature_per_level
    C = L * 8  # flattened (level, corner) slots — 128 for the flagship 16
    batch_shape = xyz.shape[:-1]
    x = xyz.reshape(-1, 3)
    m = x.shape[0]

    # per-slot static tables, slot k = (level k//8, corner k%8).  All live
    # in the 128-lane minor dimension, so every intermediate is a clean
    # (M, C) tile — deep (M, L, 8, 3)-style shapes pad their tiny minor
    # dims to 128 lanes and blow up HBM ~40x.
    level_of = [k // 8 for k in range(C)]
    scales = jnp.asarray(
        [
            layout.base_res * math.exp(level_of[k] * layout.log_b) - 1.0
            for k in range(C)
        ],
        jnp.float32,
    )
    res = jnp.asarray(
        [layout.resolutions[level_of[k]] for k in range(C)], jnp.uint32
    )
    map_sizes = jnp.asarray(
        [layout.map_sizes[level_of[k]] for k in range(C)], jnp.uint32
    )
    offsets = jnp.asarray(
        [layout.offsets[level_of[k]] for k in range(C)], jnp.int32
    )
    use_under = jnp.asarray(
        [level_of[k] < layout.begin_fast_hash_level for k in range(C)],
        jnp.bool_,
    )
    bits = [
        jnp.asarray([(k % 8 >> d) & 1 for k in range(C)], jnp.uint32)
        for d in range(3)
    ]
    # slot -> level selector for the corner reduction (one MXU matmul)
    sel = jnp.asarray(
        [[1.0 if level_of[k] == lv else 0.0 for lv in range(L)]
         for k in range(C)],
        jnp.float32,
    )  # (C, L)

    w = None
    c = []
    for d in range(3):
        pos_d = x[:, d : d + 1] * scales[None, :] + 0.5  # (M, C)
        pg_d = jnp.floor(pos_d)
        fr_d = pos_d - pg_d
        c.append(pg_d.astype(jnp.int32).astype(jnp.uint32) + bits[d])
        w_d = jnp.where(bits[d].astype(jnp.bool_), fr_d, 1.0 - fr_d)
        w = w_d if w is None else w * w_d

    h_under = c[0] + c[1] * res + c[2] * res * res
    h_fast = (
        c[0] * jnp.uint32(_PRIMES[0])
        ^ c[1] * jnp.uint32(_PRIMES[1])
        ^ c[2] * jnp.uint32(_PRIMES[2])
    )
    h = jnp.where(use_under, h_under, h_fast)
    idx = (h % map_sizes).astype(jnp.int32) + offsets  # (M, C)

    # one flat gather per feature channel + one matmul corner-reduce;
    # bf16 tables with the flagship F=2 take the packed-pair path — one
    # u32 gather per slot instead of two bf16 gathers (same bytes, half
    # the issue slots; forward bit-identical to the per-channel gathers)
    if table.dtype == jnp.bfloat16 and F == 2:
        chans = _gather_pair_bf16(table, idx)  # 2 x (M, C) f32
    else:
        chans = [jnp.take(table[f], idx, axis=0) for f in range(F)]
    outs = []
    for f in range(F):
        outs.append(
            jnp.dot(
                w * chans[f],
                sel,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )  # (M, L)
    out = jnp.stack(outs, axis=-1)  # (M, L, F) -> level-major flat
    return out.reshape(*batch_shape, L * F)
