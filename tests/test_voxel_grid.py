"""Voxel-grid (svox) model family tests — the reference's version would
NameError if called (networks.py:569-574); ours trains."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_nerfs_tpu.models import voxel_grid
from taichi_nerfs_tpu.train import Trainer


@pytest.fixture()
def svox_config(tiny_config):
    model = tiny_config.model.replace(
        name="svox",
        voxel_grid_size=48,
        voxel_radius=1.05 / 48,  # grid spans ~[-0.5, 0.5]
        voxel_sh_degree=1,
    )
    return dataclasses.replace(tiny_config, model=model)


def test_query_nearest_and_trilinear(svox_config):
    cfg = svox_config.model
    params = voxel_grid.init_params(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])  # in / out
    sigma = np.asarray(voxel_grid.density(params, cfg, pts))
    assert sigma.shape == (2,)
    assert sigma[0] > 0
    # out-of-grid point: zero fields -> softplus(0)
    assert np.isclose(sigma[1], np.log(2.0), atol=1e-5)
    sh_n, dens_n = voxel_grid.query_grids(params, cfg, pts, use_trilinear=False)
    sh_t, dens_t = voxel_grid.query_grids(params, cfg, pts, use_trilinear=True)
    # constant-initialized grid: trilinear == nearest inside
    np.testing.assert_allclose(
        np.asarray(dens_n)[0], np.asarray(dens_t)[0], rtol=1e-5
    )


def test_forward_shapes_and_range(svox_config):
    cfg = svox_config.model
    params = voxel_grid.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 3), minval=-0.4, maxval=0.4)
    d = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 3))
    sigma, rgb = voxel_grid.forward(params, cfg, x, d)
    assert sigma.shape == (4, 8)
    assert rgb.shape == (4, 8, 3)
    assert np.all(np.asarray(sigma) >= 0)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


@pytest.mark.slow
def test_svox_trains(svox_config):
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset

    scene = SyntheticSphereDataset(n_images=8, img_wh=(32, 32))
    trainer = Trainer(
        svox_config,
        scene.as_batch(),
        scene.K,
        scene.img_wh,
        log_fn=lambda *_: None,
    )
    first = last = None
    for i in range(120):
        m = trainer.run_step()
        if i == 0:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    assert last < first, (first, last)
