"""Hash / triplane encoder tests: numpy oracle + gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from taichi_nerfs_tpu.config import HashGridConfig, TriPlaneConfig
from taichi_nerfs_tpu.ops.hash_encoder import (
    build_layout,
    hash_encode,
    init_hash_table,
)
from taichi_nerfs_tpu.ops.triplane import init_triplane_table, triplane_encode

PRIMES = (1, 2654435761, 805459861)


def _oracle_hash_encode(table, xyz, layout):
    """Scalar numpy re-derivation of the reference kernel
    (modules/hash_encoder.py:89-143)."""
    n = xyz.shape[0]
    out = np.zeros((n, layout.levels * layout.feature_per_level), np.float64)
    for i in range(n):
        for lvl in range(layout.levels):
            scale = layout.base_res * np.exp(lvl * layout.log_b) - 1.0
            res = layout.resolutions[lvl]
            pos = xyz[i] * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            acc = np.zeros(layout.feature_per_level)
            for corner in range(8):
                w = 1.0
                c = np.zeros(3, np.uint64)
                for d in range(3):
                    if corner & (1 << d):
                        c[d] = pg[d] + 1
                        w *= frac[d]
                    else:
                        c[d] = pg[d]
                        w *= 1 - frac[d]
                if lvl < layout.begin_fast_hash_level:
                    h = (
                        int(c[0]) + int(c[1]) * res + int(c[2]) * res * res
                    ) % (2**32)
                else:
                    h = 0
                    for d in range(3):
                        h ^= (int(c[d]) * PRIMES[d]) % (2**32)
                idx = layout.offsets[lvl] + h % layout.map_sizes[lvl]
                acc += w * table[idx]
            out[i, lvl * layout.feature_per_level : (lvl + 1) * layout.feature_per_level] = acc
    return out


def test_hash_encode_matches_oracle(rng):
    cfg = HashGridConfig(
        levels=6, feature_per_level=2, log2_T=9, base_res=4, max_res=64
    )
    layout = build_layout(cfg)
    # some dense levels, some hashed
    assert 0 < layout.begin_fast_hash_level < cfg.levels
    table = np.asarray(init_hash_table(jax.random.PRNGKey(0), layout))
    assert table.shape == (layout.feature_per_level, layout.n_entries)
    xyz = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(xyz), layout))
    # oracle indexes entry-major (n_entries, F) like the reference
    want = _oracle_hash_encode(table.T.astype(np.float64), xyz, layout)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hash_encode_table_grads():
    cfg = HashGridConfig(
        levels=3, feature_per_level=2, log2_T=8, base_res=4, max_res=16
    )
    layout = build_layout(cfg)
    table = init_hash_table(jax.random.PRNGKey(1), layout)
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (16, 3))

    def f(t):
        return jnp.sum(hash_encode(t, xyz, layout) ** 2)

    check_grads(f, (table,), order=1, modes=("rev",), rtol=0.1, atol=1e-2, eps=1e-2)


def test_layout_matches_reference_sizing():
    """Default config reproduces the reference's table geometry."""
    cfg = HashGridConfig()  # 16 levels, 2^19 cap, base 16, max 1024
    layout = build_layout(cfg)
    assert layout.resolutions[0] == 16
    assert layout.resolutions[-1] == 1024
    # level 0: 16^3 = 4096 (already 8-aligned)
    assert layout.map_sizes[0] == 4096
    # capped levels hit 2^19
    assert max(layout.map_sizes) == 2**19
    assert layout.offsets[1] == 4096


def test_triplane_matches_symmetry(rng):
    """Product-of-planes output: constant table -> constant output."""
    cfg = TriPlaneConfig(levels=4, feature_per_level=2, base_res=4, max_res=32)
    table = jnp.ones((3, cfg.max_res**2, cfg.feature_per_level)) * 0.5
    xyz = jnp.asarray(rng.uniform(0, 1, size=(8, 3)).astype(np.float32))
    out = np.asarray(triplane_encode(table, xyz, cfg))
    assert out.shape == (8, cfg.out_dim)
    np.testing.assert_allclose(out, 0.5**3, rtol=1e-5)


def test_triplane_grads():
    cfg = TriPlaneConfig(levels=2, feature_per_level=2, base_res=4, max_res=8)
    table = init_triplane_table(jax.random.PRNGKey(3), cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (8, 3))

    def f(t):
        return jnp.sum(triplane_encode(t, xyz, cfg))

    check_grads(f, (table,), order=1, modes=("rev",), rtol=0.1, atol=1e-2, eps=1e-2)
