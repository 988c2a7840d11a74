"""Occupancy-grid ray marching — TPU-native.

Rebuild of the reference's irregular Taichi marching kernels
(``modules/ray_march.py:8-334``).  The reference marches each ray in its own
GPU thread: data-dependent while-loops, DDA empty-space skips, two passes,
and atomic stream compaction into a packed slab.  None of that maps to XLA.

The TPU-native design is **probe-everything, then compact**:

1.  Every ray's step lattice ``t_0 = t_near, t_{k+1} = t_k + calc_dt(t_k)``
    has a *closed form* (``calc_dt`` is a clamped linear function of ``t``,
    so the lattice is: constant ``dt_min`` steps, then geometric growth,
    then constant ``dt_max`` steps).  We materialize all K candidate
    positions per ray at once — no sequential dependence.
2.  One vectorized morton/bitfield probe classifies all ``N x K``
    candidates (a single fused gather — measured ~0.05 ms for 9.4M probes
    on v5e, versus ~6-16 us *per while-loop iteration* for an event loop).
3.  ``lax.top_k`` compacts the first ``S`` occupied candidates per ray into
    a dense ``(N, S)`` sample grid + counts.

Fidelity (pinned by the serial oracle in ``tests/test_march.py``): the
reference never leaves the iterated ``t += calc_dt(t)`` lattice — its DDA
skip advances by ``calc_dt`` increments until it clears the cell boundary
(``ray_march.py:71-74``) — so in BOTH step regimes the closed-form lattice
reproduces its trajectory and the probe marcher visits exactly the
reference's probe points.  The one divergence is *in our favor*: the
reference's skip target uses the continuous cell coordinate, not the cell
floor (``ray_march.py:68-70``), overshooting the boundary by up to one
cell and skipping straight over occupied cells; the probe marcher samples
those too, so its sample set is a strict superset of the reference's.

The same marcher serves training (fresh ``t`` from the AABB hit, perturbed
first sample, ``ray_march.py:38-40``) and the test renderer (resumable:
marches a window of candidates from a carried ``t`` and returns where it
stopped, like the reference's in-place ``hits_t`` update,
``ray_march.py:250-258``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math import (
    SQRT3_2,
    SQRT3_MAX_SAMPLES,
    bitfield_test,
    calc_dt,
    mip_from_dt,
    mip_from_pos,
    morton3d,
)


class MarchResult(NamedTuple):
    ts: jnp.ndarray  # (N, S) sample midpoints
    deltas: jnp.ndarray  # (N, S) sample intervals
    counts: jnp.ndarray  # (N,) int32 number of valid samples per ray
    t_final: jnp.ndarray  # (N,) marching position when the window ended


def num_candidates(
    scale: float,
    exp_step_factor: float,
    grid_size: int = 128,
    near: float = 0.01,
) -> int:
    """Static candidate-window size K covering a full AABB traversal."""
    dt_min = SQRT3_MAX_SAMPLES
    dt_max = SQRT3_2 * scale / grid_size
    span = 2.0 * math.sqrt(3.0) * scale
    if exp_step_factor == 0.0:
        return int(math.ceil(span / dt_min)) + 8
    # constant-min regime + geometric regime + slack
    t_lo_end = dt_min / exp_step_factor
    n1 = int(math.ceil(max(t_lo_end - near, 0.0) / dt_min))
    t_start_geo = max(near, t_lo_end)
    n2 = int(
        math.ceil(
            math.log(max((near + span) / t_start_geo, 1.0 + 1e-6))
            / math.log1p(exp_step_factor)
        )
    )
    n3 = int(math.ceil(span / dt_max)) + 8
    return n1 + n2 + min(n3, 4096)


def lattice_at(
    t_start: jnp.ndarray,
    k: jnp.ndarray,
    exp_step_factor: float,
    grid_size: int,
    scale: float,
):
    """Evaluate the closed-form step lattice at arbitrary step indices.

    ``t_start``: (N,) per-ray lattice origin; ``k``: (N, ...) float step
    indices.  Returns (ts, dts) of ``k``'s shape.  Because the lattice is
    closed-form, selected samples are *recomputed* from their index instead
    of gathered from the candidate grid — random access on TPU runs at
    ~113M elem/s while this arithmetic streams on the VPU.
    """
    dt_min = SQRT3_MAX_SAMPLES
    dt_max = SQRT3_2 * scale / grid_size
    t1 = t_start.reshape(t_start.shape + (1,) * (k.ndim - 1))
    if exp_step_factor == 0.0:
        ts = t1 + k * dt_min
        dts = jnp.full_like(ts, dt_min)
        return ts, dts

    f = exp_step_factor
    log1pf = math.log1p(f)
    t_lo_end = dt_min / f  # below this t the step clamps to dt_min
    t_hi_end = dt_max / f  # above this t the step clamps to dt_max

    # regime 1: n1 constant dt_min steps until t >= t_lo_end
    n1 = jnp.ceil(jnp.maximum(t_lo_end - t1, 0.0) / dt_min)
    t_geo0 = t1 + n1 * dt_min  # first t in the geometric regime
    # regime 2: n2 geometric steps t <- t * (1 + f) until t > t_hi_end
    n2 = jnp.ceil(
        jnp.log(jnp.maximum(t_hi_end / jnp.maximum(t_geo0, 1e-30), 1.0))
        / log1pf
    )
    t_hi0 = t_geo0 * jnp.exp(n2 * log1pf)  # first t in the constant-max regime

    in_r1 = k < n1
    in_r2 = (~in_r1) & (k < n1 + n2)
    ts = jnp.where(
        in_r1,
        t1 + k * dt_min,
        jnp.where(
            in_r2,
            t_geo0 * jnp.exp((k - n1) * log1pf),
            t_hi0 + (k - n1 - n2) * dt_max,
        ),
    )
    dts = jnp.clip(ts * f, dt_min, dt_max)
    return ts, dts


def candidate_lattice(
    t_start: jnp.ndarray,
    n_candidates: int,
    exp_step_factor: float,
    grid_size: int,
    scale: float,
):
    """Closed-form step lattice: (N, K) candidate ``t``s and their ``dt``s.

    Reproduces iterated ``t += calc_dt(t, ...)`` (modules/utils.py:54-57)
    without the sequential dependence.
    """
    k = jnp.broadcast_to(
        jnp.arange(n_candidates, dtype=jnp.float32)[None, :],
        (t_start.shape[0], n_candidates),
    )
    return lattice_at(k=k, t_start=t_start, exp_step_factor=exp_step_factor,
                      grid_size=grid_size, scale=scale)


def occupancy_probe(
    xyz: jnp.ndarray,
    dt: jnp.ndarray,
    bitfield: jnp.ndarray,
    cascades: int,
    grid_size: int,
    scale: float,
) -> jnp.ndarray:
    """Vectorized cascade pick + morton bitfield probe.

    Step-for-step the reference's per-sample logic
    (``ray_march.py:46-61``): cascade = max(mip_from_pos, mip_from_dt),
    position normalized into the cascade's cube, morton-indexed bit test.
    """
    mip = jnp.maximum(
        mip_from_pos(xyz, cascades), mip_from_dt(dt, grid_size, cascades)
    )
    mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32) - 1.0), scale)
    nxyz = jnp.clip(
        0.5 * (xyz / mip_bound[..., None] + 1.0) * grid_size,
        0.0,
        grid_size - 1.0,
    )
    idx = mip * (grid_size**3) + morton3d(nxyz.astype(jnp.uint32))
    return bitfield_test(bitfield, idx)


def _march_rays_intervals(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    bitfield: jnp.ndarray,
    *,
    scale: float,
    grid_size: int,
    sample_cap: int,
) -> "MarchResult":
    """Cell-interval marcher: the single-cascade / constant-dt fast path.

    The probe-everything marcher tests the occupancy grid at every lattice
    point — ``K ~ 1032`` random bitfield probes per ray, and random access
    on v5e runs at only ~113M elem/s (measured), so probes alone cost
    ~64 ms/step at batch 8192.  But consecutive lattice points mostly share
    a cell (cell diagonal / dt = 8 for the default config): probing once
    per *crossed cell* is exact and ~4x cheaper.

    1. Cell boundary crossings along the ray are 3 arithmetic sequences
       ``t = (plane_j - o_a) / d_a`` — merged with one lane-axis sort
       (fast on TPU: ~4 ms for (8192, 384)).
    2. One occupancy probe per boundary interval (its midpoint's cell).
    3. Each occupied interval expands to its ≤E lattice indices in closed
       form (``k_lo = ceil((lo - t0)/dt)``), no gather; ``lax.top_k``
       compacts the first S occupied candidates per ray as before.

    Produces the same sample set as the lattice marcher (same dt lattice,
    same per-sample cell occupancy test) up to float boundary ties.
    """
    n = rays_o.shape[0]
    G = grid_size
    dt = SQRT3_MAX_SAMPLES
    h = 2.0 * scale / G  # cell edge
    # max lattice points per cell-interval (diagonal crossing), +1 slack
    # for ceil boundary alignment
    E = int(math.ceil((h * math.sqrt(3.0)) / dt)) + 1

    alive = t_start >= 0.0
    t0 = jnp.where(alive, t_start, 0.0)
    t1 = jnp.maximum(jnp.where(alive, t_end, 0.0), t0)

    # interior plane crossings per axis: planes at -scale + j*h, j=1..G-1
    j = jnp.arange(1, G, dtype=jnp.float32)  # (G-1,)
    planes = -scale + j * h  # (G-1,)
    inv_d = jnp.where(jnp.abs(rays_d) > 1e-12, 1.0 / rays_d, jnp.inf)
    cross = (planes[None, None, :] - rays_o[:, :, None]) * inv_d[
        :, :, None
    ]  # (N, 3, G-1)
    cross = cross.reshape(n, 3 * (G - 1))
    inside = (cross > t0[:, None]) & (cross < t1[:, None])
    cross = jnp.where(inside, cross, jnp.inf)
    # append the AABB exit so the last real interval closes at t_end;
    # pad the boundary count to a multiple of 128 lanes
    n_b = 3 * (G - 1) + 1
    pad = (-n_b) % 128
    b = jnp.concatenate(
        [cross, t1[:, None], jnp.full((n, pad), jnp.inf)], axis=1
    )
    b = jnp.sort(b, axis=1)  # (N, B) ascending, inf-padded
    lo = jnp.concatenate([t0[:, None], b[:, :-1]], axis=1)  # (N, B)
    hi = b

    # one probe per interval, at the midpoint's cell (single cascade)
    finite = jnp.isfinite(hi) & (lo < t1[:, None])
    t_mid = jnp.where(finite, 0.5 * (lo + hi), t0[:, None])
    xyz = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    nxyz = jnp.clip(0.5 * (xyz / scale + 1.0) * G, 0.0, G - 1.0)
    cell = morton3d(nxyz.astype(jnp.uint32))
    occ = bitfield_test(bitfield, cell) & finite & alive[:, None]

    # closed-form lattice indices inside each interval (disjoint by
    # construction: k_hi(i) == k_lo(i+1), computed by the same expression)
    k_lo = jnp.ceil((lo - t0[:, None]) / dt)
    k_hi = jnp.ceil((jnp.minimum(hi, t1[:, None]) - t0[:, None]) / dt)
    count = jnp.clip(k_hi - k_lo, 0.0, float(E))
    e = jnp.arange(E, dtype=jnp.float32)
    ks = k_lo[:, :, None] + e[None, None, :]  # (N, B, E)
    valid_c = (e[None, None, :] < count[:, :, None]) & occ[:, :, None]
    B = b.shape[1]
    ks = ks.reshape(n, B * E)
    valid_c = valid_c.reshape(n, B * E)

    # compact the first S occupied lattice points per ray (ascending k)
    kmax = float(B * E + 2)
    key = jnp.where(valid_c, kmax - ks, 0.0)
    s_eff = sample_cap
    top_keys, _ = jax.lax.top_k(key, s_eff)  # descending == ascending k
    valid = top_keys > 0.0
    sel = jnp.where(valid, kmax - top_keys, 0.0)
    ts = t0[:, None] + sel * dt
    deltas = jnp.full_like(ts, dt)
    ts = jnp.where(valid, ts, 0.0)
    deltas = jnp.where(valid, deltas, 0.0)
    counts = jnp.minimum(
        jnp.sum(valid_c, axis=1), sample_cap
    ).astype(jnp.int32)

    capped = counts >= sample_cap
    last = jnp.maximum(counts - 1, 0)
    t_after_cap = (
        jnp.take_along_axis(ts, last[:, None], axis=1)[:, 0] + dt
    )
    t_final = jnp.where(capped, t_after_cap, t_end)
    t_final = jnp.where(alive, t_final, t_start)
    return MarchResult(ts=ts, deltas=deltas, counts=counts, t_final=t_final)


@partial(
    jax.jit,
    static_argnames=(
        "cascades",
        "scale",
        "exp_step_factor",
        "grid_size",
        "sample_cap",
        "n_candidates",
    ),
)
def march_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    bitfield: jnp.ndarray,
    *,
    cascades: int,
    scale: float,
    exp_step_factor: float,
    grid_size: int,
    sample_cap: int,
    n_candidates: int | None = None,
) -> MarchResult:
    """March all rays through the occupancy grid, collecting samples.

    Args:
        rays_o, rays_d: (N, 3).
        t_start: (N,) first sample position (< 0 marks a dead/missed ray).
        t_end: (N,) AABB exit.
        bitfield: (cascades * grid_size**3 // 32,) uint32 occupancy.
        sample_cap: S, per-ray sample capacity of the dense output.
        n_candidates: K, static probe-window length (defaults to a full
            AABB traversal).
    """
    if (
        n_candidates is None
        and cascades == 1
        and exp_step_factor == 0.0
    ):
        # full-traversal march in the single-cascade constant-dt regime:
        # probe per crossed cell (exact, ~4x fewer bitfield probes)
        return _march_rays_intervals(
            rays_o,
            rays_d,
            t_start,
            t_end,
            bitfield,
            scale=scale,
            grid_size=grid_size,
            sample_cap=sample_cap,
        )
    if n_candidates is None:
        n_candidates = num_candidates(scale, exp_step_factor)
    n = rays_o.shape[0]
    K = n_candidates

    ts_cand, dts_cand = candidate_lattice(
        t_start, K, exp_step_factor, grid_size, scale
    )  # (N, K)
    live = (t_start >= 0.0)[:, None] & (ts_cand < t_end[:, None])
    xyz = rays_o[:, None, :] + ts_cand[..., None] * rays_d[:, None, :]
    occ = occupancy_probe(
        xyz, dts_cand, bitfield, cascades, grid_size, scale
    )
    occ = occ & live

    # compact: first S occupied candidates per ray (ascending k)
    k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    key = jnp.where(occ, K - k_idx, 0)  # larger key == earlier candidate
    s_eff = min(sample_cap, K)
    top_keys, _ = jax.lax.top_k(key, s_eff)  # (N, s_eff) descending
    if s_eff < sample_cap:  # window shorter than the cap: pad invalid slots
        top_keys = jnp.pad(top_keys, ((0, 0), (0, sample_cap - s_eff)))
    valid = top_keys > 0
    sel = jnp.where(valid, K - top_keys, 0)  # (N, S) candidate indices
    # recompute ts/dts from the selected indices (closed-form lattice)
    # instead of take_along_axis gathers: ~9 ns per gathered element on v5e
    # makes 2x(N, S) gathers cost ~45 ms/step at the warmup shapes
    ts, deltas = lattice_at(
        t_start, sel.astype(jnp.float32), exp_step_factor, grid_size, scale
    )
    ts = jnp.where(valid, ts, 0.0)
    deltas = jnp.where(valid, deltas, 0.0)
    counts = jnp.minimum(jnp.sum(occ, axis=1), sample_cap).astype(jnp.int32)

    # resume point: after the S-th sample if the cap was hit, else after the
    # candidate window (clipped at the AABB exit)
    capped = counts >= sample_cap
    last = jnp.maximum(counts - 1, 0)
    t_after_cap = (
        jnp.take_along_axis(ts, last[:, None], axis=1)[:, 0]
        + jnp.take_along_axis(deltas, last[:, None], axis=1)[:, 0]
    )
    t_window_end = jnp.minimum(
        ts_cand[:, -1] + dts_cand[:, -1], t_end
    )
    t_final = jnp.where(capped, t_after_cap, t_window_end)
    t_final = jnp.where(t_start >= 0.0, t_final, t_start)
    return MarchResult(ts=ts, deltas=deltas, counts=counts, t_final=t_final)


def perturb_t_start(
    hits_t: jnp.ndarray,
    noise: jnp.ndarray,
    exp_step_factor: float,
    grid_size: int,
    scale: float,
) -> jnp.ndarray:
    """Perturb the first sample by noise*dt (reference: ray_march.py:38-40)."""
    t1 = hits_t[:, 0]
    dt = calc_dt(t1, exp_step_factor, grid_size, scale)
    return jnp.where(t1 >= 0.0, t1 + dt * noise, t1)


def sample_positions(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, ts: jnp.ndarray
) -> jnp.ndarray:
    """(N, S) sample t's -> (N, S, 3) world positions."""
    return rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]


def valid_mask(counts: jnp.ndarray, sample_cap: int) -> jnp.ndarray:
    """(N,) counts -> (N, S) boolean sample validity."""
    return (
        jnp.arange(sample_cap, dtype=jnp.int32)[None, :] < counts[:, None]
    )
