"""NGP model and occupancy grid tests."""

import jax
import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.models import ngp
from taichi_nerfs_tpu.models.occupancy import (
    init_occupancy,
    mark_invisible_cells,
    update_density_grid,
)
from taichi_nerfs_tpu.ops.math import bitfield_test, morton3d


def test_trunc_exp_forward_backward():
    x = jnp.asarray([0.0, 1.0, 20.0, -20.0])
    y = np.asarray(ngp.trunc_exp(x))
    np.testing.assert_allclose(y, np.exp(np.asarray(x)), rtol=1e-5)
    g = np.asarray(jax.grad(lambda v: jnp.sum(ngp.trunc_exp(v)))(x))
    # grads clamp the exponent to [-15, 15]
    np.testing.assert_allclose(
        g, np.exp(np.clip(np.asarray(x), -15, 15)), rtol=1e-5
    )


def test_model_shapes(tiny_config):
    cfg = tiny_config.model
    params = ngp.init_ngp_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (32, 3), minval=-cfg.scale, maxval=cfg.scale
    )
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    sigmas, rgbs = ngp.forward(params, cfg, x, d)
    assert sigmas.shape == (32,)
    assert rgbs.shape == (32, 3)
    assert np.all(np.asarray(sigmas) > 0)
    assert np.all((np.asarray(rgbs) >= 0) & (np.asarray(rgbs) <= 1))
    # density-only path agrees with forward's sigma
    sig2 = ngp.density(params, cfg, x)
    np.testing.assert_allclose(np.asarray(sig2), np.asarray(sigmas), rtol=1e-5)


def test_model_batched_shapes(tiny_config):
    cfg = tiny_config.model
    params = ngp.init_ngp_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((4, 8, 3))
    d = jnp.ones((4, 8, 3))
    sigmas, rgbs = ngp.forward(params, cfg, x, d)
    assert sigmas.shape == (4, 8)
    assert rgbs.shape == (4, 8, 3)


def test_mark_invisible_cells(tiny_config):
    cfg = tiny_config.model
    # one narrow-FOV camera at -z looking at the origin (frustum half-width
    # ~0.24 at the near face of the cube, so corner cells are invisible)
    K = jnp.asarray(
        [[200.0, 0.0, 32.0], [0.0, 200.0, 32.0], [0.0, 0.0, 1.0]]
    )
    pose = jnp.asarray(
        [[[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, -2.0]]]
    )
    occ = mark_invisible_cells(cfg, K, pose, (64, 64), chunk=8192)
    grid = np.asarray(occ.density_grid)
    # cells in front of the camera near the axis are visible (0.0),
    # cells far off-axis or behind are -1
    g = cfg.grid_size
    center_cell = morton3d(jnp.asarray([[g // 2, g // 2, g // 2]]))[0]
    assert grid[0, int(center_cell)] == 0.0
    assert (grid == -1).any()
    assert np.asarray(occ.count_grid).max() > 0


def test_update_density_grid(tiny_config):
    cfg = tiny_config.model
    params = ngp.init_ngp_params(jax.random.PRNGKey(0), cfg)
    occ = init_occupancy(cfg)
    key = jax.random.PRNGKey(3)
    occ1 = update_density_grid(
        params, cfg, ngp.density, occ, key, density_threshold=0.01,
        warmup=True, chunk=8192,
    )
    # after warmup all (visible) cells hold fresh positive densities
    assert float(jnp.max(occ1.density_grid)) > 0
    assert int(jnp.sum(occ1.bitfield)) > 0
    # EMA: a second update cannot drop densities faster than decay
    occ2 = update_density_grid(
        params, cfg, ngp.density, occ1, key, density_threshold=0.01,
        warmup=False, chunk=8192,
    )
    assert np.all(
        np.asarray(occ2.density_grid)
        >= np.asarray(occ1.density_grid) * 0.95 - 1e-6
    )
    # bitfield bits correspond to density > min(mean, threshold)
    dens = np.asarray(occ2.density_grid).reshape(-1)
    pos = dens[dens > 0]
    thr = min(pos.mean(), 0.01)
    idx = jnp.arange(dens.size)
    bits = np.asarray(bitfield_test(occ2.bitfield, idx))
    np.testing.assert_array_equal(bits, dens > thr)
