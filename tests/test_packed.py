"""Packed (stream-compacted) field eval must match the dense path."""

import jax
import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.models.ngp import init_ngp_params
from taichi_nerfs_tpu.models.occupancy import init_occupancy
from taichi_nerfs_tpu.ops.math import packbits_u32
from taichi_nerfs_tpu.render.renderer import render_train


def _setup(tiny_config):
    cfg = tiny_config
    params = init_ngp_params(jax.random.PRNGKey(0), cfg.model)
    occ = init_occupancy(cfg.model)
    bitfield = packbits_u32(jnp.ones_like(occ.density_grid.reshape(-1)), 0.5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    n = 64
    rays_o = jax.random.uniform(k1, (n, 3), minval=-1.2, maxval=-0.9)
    rays_d = jax.random.normal(k2, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return cfg, params, bitfield, rays_o, rays_d


def test_packed_matches_dense(tiny_config):
    cfg, params, bitfield, rays_o, rays_d = _setup(tiny_config)
    key = jax.random.PRNGKey(9)
    S = 64

    run = jax.jit(
        lambda pack_cap: render_train(
            params,
            cfg.model,
            cfg.render,
            bitfield,
            rays_o,
            rays_d,
            key,
            S,
            pack_cap,
        ),
        static_argnums=0,
    )
    dense = run(None)
    total = int(jnp.sum(dense["counts"]))
    assert total > 0
    # generous cap: every valid sample packed -> bitwise-equivalent math
    packed = run(int(2 ** np.ceil(np.log2(total + 1))))
    np.testing.assert_allclose(
        np.asarray(packed["rgb"]), np.asarray(dense["rgb"]), rtol=2e-5,
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(packed["depth"]), np.asarray(dense["depth"]), rtol=2e-5,
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(packed["opacity"]),
        np.asarray(dense["opacity"]),
        rtol=2e-5,
        atol=2e-6,
    )


def test_packed_gradients_match_dense(tiny_config):
    cfg, params, bitfield, rays_o, rays_d = _setup(tiny_config)
    key = jax.random.PRNGKey(9)
    S = 64

    def loss(p, pack_cap):
        res = render_train(
            p, cfg.model, cfg.render, bitfield, rays_o, rays_d, key, S,
            pack_cap,
        )
        return jnp.mean(res["rgb"] ** 2)

    g_dense = jax.jit(jax.grad(loss), static_argnums=1)(params, None)
    g_packed = jax.jit(jax.grad(loss), static_argnums=1)(params, 4096)

    def _cmp(path, va, vb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-3, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(_cmp, g_dense, g_packed)
