"""Brick encoder: oracle + gradient tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_nerfs_tpu.ops.brick_encoder import (
    BrickGridConfig,
    brick_encode,
    build_brick_layout,
    init_brick_params,
    _PRIMES,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _oracle(params, xyz, layout):
    """Scalar-loop reference of the brick encode."""
    corners = np.asarray(params["corners"], np.float64)
    bricks = np.asarray(params["bricks"], np.float64)
    M = xyz.shape[0]
    out = np.zeros((M, layout.levels * layout.F))
    hoff_per_level = {}
    hoff = 0
    for lv in range(layout.levels):
        if not layout.dense[lv]:
            hoff_per_level[lv] = hoff
            hoff += layout.rows[lv]
    for m in range(M):
        for lv in range(layout.levels):
            scale = layout.base_res * np.exp(lv * layout.log_b) - 1.0
            pos = xyz[m] * scale + 0.5
            g = np.floor(pos).astype(np.int64)
            frac = pos - g
            res = layout.resolutions[lv]
            feat = np.zeros(layout.F)
            if layout.dense[lv]:
                cres = layout.corner_res[lv]
                coff = layout.corner_offsets[lv]
                for c in range(8):
                    cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                    w = (
                        (frac[0] if cx else 1 - frac[0])
                        * (frac[1] if cy else 1 - frac[1])
                        * (frac[2] if cz else 1 - frac[2])
                    )
                    q = g + np.array([cx, cy, cz])
                    idx = coff + q[0] + q[1] * cres + q[2] * cres * cres
                    feat += w * corners[idx]
            else:
                h = (
                    np.uint32(g[0]) * np.uint32(_PRIMES[0])
                    ^ np.uint32(g[1] * _PRIMES[1])
                    ^ np.uint32(g[2] * _PRIMES[2])
                )
                row = int(h % np.uint32(layout.rows[lv]))
                brick = bricks[hoff_per_level[lv] + row]
                for c in range(8):
                    cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                    w = (
                        (frac[0] if cx else 1 - frac[0])
                        * (frac[1] if cy else 1 - frac[1])
                        * (frac[2] if cz else 1 - frac[2])
                    )
                    feat += w * brick[c * layout.F : (c + 1) * layout.F]
            out[m, lv * layout.F : (lv + 1) * layout.F] = feat
    return out


def _small_cfg():
    return BrickGridConfig(
        levels=4, feature_per_level=2, log2_rows=9, base_res=4, max_res=32
    )


def test_brick_layout():
    layout = build_brick_layout(_small_cfg())
    assert layout.levels == 4
    # coarse levels dense, fine hashed
    assert layout.dense[0] and not layout.dense[-1]
    assert layout.n_rows == sum(layout.rows)


def test_brick_encode_matches_oracle(rng):
    cfg = _small_cfg()
    layout = build_brick_layout(cfg)
    params = init_brick_params(jax.random.PRNGKey(0), layout)
    xyz = rng.uniform(0, 1, size=(32, 3)).astype(np.float32)
    got = np.asarray(brick_encode(params, jnp.asarray(xyz), layout))
    want = _oracle(params, xyz, layout)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_brick_encode_grads(rng):
    cfg = _small_cfg()
    layout = build_brick_layout(cfg)
    params = init_brick_params(jax.random.PRNGKey(1), layout)
    xyz = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)), jnp.float32)
    cot = jnp.asarray(
        rng.normal(size=(16, layout.out_dim)), jnp.float32
    )

    @jax.jit
    def loss(p):
        return jnp.sum(brick_encode(p, xyz, layout) * cot)

    g = jax.jit(jax.grad(loss))(params)
    # finite differences on a few random parameters of each piece
    eps = 1e-3
    for name in ("corners", "bricks"):
        arr = np.asarray(params[name])
        flat_g = np.asarray(g[name]).reshape(-1)
        nz = np.nonzero(flat_g)[0]
        assert nz.size > 0, f"no gradient reached {name}"
        for k in nz[:: max(1, nz.size // 5)][:5]:
            pert = params[name].reshape(-1).at[k].add(eps).reshape(arr.shape)
            lp = loss({**params, name: pert})
            pert = params[name].reshape(-1).at[k].add(-eps).reshape(arr.shape)
            lm = loss({**params, name: pert})
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(flat_g[k], fd, rtol=2e-2, atol=1e-3)


def test_brick_encode_batch_shape(rng):
    cfg = _small_cfg()
    layout = build_brick_layout(cfg)
    params = init_brick_params(jax.random.PRNGKey(2), layout)
    xyz = jnp.asarray(rng.uniform(0, 1, size=(4, 5, 3)), jnp.float32)
    out = brick_encode(params, xyz, layout)
    assert out.shape == (4, 5, layout.out_dim)
