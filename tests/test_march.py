"""Ray-marching tests: sampling distribution vs reference semantics."""

import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.ops.marching import (
    march_rays,
    perturb_t_start,
    sample_positions,
    valid_mask,
)
from taichi_nerfs_tpu.ops.math import (
    SQRT3_2,
    SQRT3_MAX_SAMPLES,
    morton3d,
    packbits_u32,
)
from taichi_nerfs_tpu.ops.rays import ray_aabb_intersect

GRID = 32
SCALE = 0.5
CASCADES = 1


def _bitfield_from_cells(occ_fn):
    """Build a bitfield from a cell-occupancy predicate (morton-indexed)."""
    g = np.arange(GRID)
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([x, y, z], -1).reshape(-1, 3)
    centers = ((coords + 0.5) / GRID * 2 - 1) * SCALE
    occ = occ_fn(centers)
    dens = np.zeros(GRID**3, np.float32)
    dens[np.asarray(morton3d(jnp.asarray(coords)))] = occ.astype(np.float32)
    return packbits_u32(jnp.asarray(dens), 0.5)


def _march(rays_o, rays_d, bitfield, cap=256, exp_step_factor=0.0):
    rays_o = jnp.asarray(rays_o, jnp.float32)
    rays_d = jnp.asarray(rays_d, jnp.float32)
    hits = ray_aabb_intersect(rays_o, rays_d, SCALE)
    return march_rays(
        rays_o,
        rays_d,
        hits[:, 0],
        hits[:, 1],
        bitfield,
        cascades=CASCADES,
        scale=SCALE,
        exp_step_factor=exp_step_factor,
        grid_size=GRID,
        sample_cap=cap,
    ), hits


def test_march_fully_occupied_constant_dt():
    bf = _bitfield_from_cells(lambda c: np.ones(len(c), bool))
    o = np.array([[0.0, 0.0, -2.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    res, hits = _march(o, d, bf, cap=1024)
    dt = SQRT3_MAX_SAMPLES
    t1, t2 = float(hits[0, 0]), float(hits[0, 1])
    expected = int((t2 - t1) / dt)
    count = int(res.counts[0])
    assert abs(count - expected) <= 2
    ts = np.asarray(res.ts[0][:count])
    np.testing.assert_allclose(np.diff(ts), dt, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.deltas[0][:count]), dt, rtol=1e-5)
    assert ts[0] >= t1 - 1e-6 and ts[-1] < t2


def test_march_empty_grid():
    bf = _bitfield_from_cells(lambda c: np.zeros(len(c), bool))
    o = np.array([[0.0, 0.0, -2.0], [0.3, 0.1, -2.0]])
    d = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    res, _ = _march(o, d, bf)
    assert int(res.counts.sum()) == 0


def test_march_missed_ray():
    bf = _bitfield_from_cells(lambda c: np.ones(len(c), bool))
    o = np.array([[2.0, 2.0, -2.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    res, hits = _march(o, d, bf)
    assert float(hits[0, 0]) == -1.0
    assert int(res.counts[0]) == 0


def test_march_samples_only_in_occupied_cells():
    """Half-space occupancy: every sample must land in an occupied cell,
    and the ray must not stop early (skips cross the empty region)."""

    def occ_fn(centers):
        return centers[:, 0] > 0.1  # occupied only where x > 0.1

    bf = _bitfield_from_cells(occ_fn)
    o = np.array([[-2.0, 0.05, 0.05], [-2.0, -0.2, 0.3]])
    d = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    res, _ = _march(o, d, bf, cap=1024)
    counts = np.asarray(res.counts)
    assert np.all(counts > 0)
    for r in range(2):
        ts = np.asarray(res.ts[r][: counts[r]])
        xyz = o[r] + ts[:, None] * d[r]
        # all samples in occupied half-space (cell-quantized boundary)
        cell_w = 2 * SCALE / GRID
        assert np.all(xyz[:, 0] > 0.1 - cell_w), xyz[:, 0].min()


def test_march_exponential_stepping():
    """exp_step_factor > 0: dt grows with t within clamp bounds."""
    bf = _bitfield_from_cells(lambda c: np.ones(len(c), bool))
    o = np.array([[0.0, 0.0, -2.0]])
    d = np.array([[0.0, 0.0, 1.0]])
    res, _ = _march(o, d, bf, cap=1024, exp_step_factor=1 / 64)
    count = int(res.counts[0])
    assert count > 0
    deltas = np.asarray(res.deltas[0][:count])
    ts = np.asarray(res.ts[0][:count])
    np.testing.assert_allclose(
        deltas,
        np.clip(ts / 64, SQRT3_MAX_SAMPLES, SQRT3_2 * SCALE / GRID),
        rtol=1e-5,
    )
    # steps grow monotonically until the clamp
    assert deltas[-1] >= deltas[0]


def test_march_resumable():
    """Marching in two 8-sample segments == one 16-sample march."""
    bf = _bitfield_from_cells(lambda c: np.ones(len(c), bool))
    o = jnp.asarray([[0.0, 0.0, -2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hits = ray_aabb_intersect(o, d, SCALE)

    kw = dict(
        cascades=CASCADES,
        scale=SCALE,
        exp_step_factor=0.0,
        grid_size=GRID,
    )
    full = march_rays(
        o, d, hits[:, 0], hits[:, 1], bf, sample_cap=16, **kw
    )
    seg1 = march_rays(
        o, d, hits[:, 0], hits[:, 1], bf, sample_cap=8, **kw
    )
    seg2 = march_rays(
        o, d, seg1.t_final, hits[:, 1], bf, sample_cap=8, **kw
    )
    ts_full = np.asarray(full.ts[0][:16])
    ts_seg = np.concatenate(
        [np.asarray(seg1.ts[0][:8]), np.asarray(seg2.ts[0][:8])]
    )
    np.testing.assert_allclose(ts_seg, ts_full, rtol=1e-5)


def test_perturb_t_start():
    hits = jnp.asarray([[0.5, 1.0], [-1.0, -1.0]])
    noise = jnp.asarray([0.5, 0.5])
    t = np.asarray(perturb_t_start(hits, noise, 0.0, GRID, SCALE))
    assert t[0] > 0.5
    assert t[1] == -1.0


def test_helpers():
    counts = jnp.asarray([0, 2, 5])
    m = np.asarray(valid_mask(counts, 4))
    np.testing.assert_array_equal(
        m,
        [
            [False, False, False, False],
            [True, True, False, False],
            [True, True, True, True],
        ],
    )
    o = jnp.zeros((1, 3))
    dd = jnp.asarray([[0.0, 0.0, 2.0]])
    ts = jnp.asarray([[1.0, 2.0]])
    pos = np.asarray(sample_positions(o, dd, ts))
    np.testing.assert_allclose(pos[0, :, 2], [2.0, 4.0])
