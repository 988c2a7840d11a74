"""Unit tests for ops.math against independent numpy oracles."""

import math

import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.ops import math as tmath


def _morton_oracle(x, y, z):
    """Bit-by-bit morton interleave."""
    code = 0
    for b in range(10):
        code |= ((x >> b) & 1) << (3 * b)
        code |= ((y >> b) & 1) << (3 * b + 1)
        code |= ((z >> b) & 1) << (3 * b + 2)
    return code


def test_morton_roundtrip(rng):
    coords = rng.randint(0, 1024, size=(1000, 3)).astype(np.int32)
    codes = np.asarray(tmath.morton3d(jnp.asarray(coords)))
    expected = np.array(
        [_morton_oracle(int(c[0]), int(c[1]), int(c[2])) for c in coords]
    )
    np.testing.assert_array_equal(codes, expected)
    inv = np.asarray(tmath.morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(inv, coords)


def test_frexp_exponent_matches_python(rng):
    xs = np.concatenate(
        [
            rng.uniform(1e-6, 100, 200).astype(np.float32),
            np.array([0.5, 1.0, 2.0, 4.0, 0.25, 0.3, 1024.0], np.float32),
        ]
    )
    got = np.asarray(tmath.frexp_exponent(jnp.asarray(xs)))
    for x, e in zip(xs, got):
        # python frexp: x = m * 2**E, m in [0.5, 1); reference wants
        # f in (0.5, 1], i.e. E for non-powers-of-two, E for exact powers
        m, E = math.frexp(float(x))
        expected = E - 1 if m == 0.5 else E
        assert e == expected, (x, e, expected)


def test_frexp_zero():
    assert int(tmath.frexp_exponent(jnp.asarray(0.0))) == 0


def test_mip_from_pos():
    xyz = jnp.asarray([[0.4, 0.0, 0.0], [0.9, 0.0, 0.0], [1.7, 0.2, 0.1]])
    mips = np.asarray(tmath.mip_from_pos(xyz, cascades=3))
    # |x| = 0.4 -> exponent -1 -> mip 0; 0.9 -> 0 -> mip 1; 1.7 -> 1 -> mip 2
    np.testing.assert_array_equal(mips, [0, 1, 2])


def test_calc_dt_bounds():
    t = jnp.asarray([0.001, 1.0, 100.0])
    dt = np.asarray(tmath.calc_dt(t, 1 / 256, 128, 0.5))
    assert dt[0] == np.float32(tmath.SQRT3_MAX_SAMPLES)
    assert np.isclose(dt[1], 1.0 / 256)
    assert np.isclose(dt[2], tmath.SQRT3_2 * 0.5 / 128)


def test_packbits_layout(rng):
    dens = rng.uniform(0, 1, size=(4096,)).astype(np.float32)
    thr = 0.5
    bf = np.asarray(tmath.packbits_u32(jnp.asarray(dens), thr))
    occ = dens > thr
    # oracle: uint8 packing like the reference, then viewed as uint32 LE
    bytes_ = np.packbits(occ.reshape(-1, 8), axis=-1, bitorder="little")
    words = bytes_.reshape(-1).view("<u4")
    np.testing.assert_array_equal(bf, words)


def test_bitfield_test_matches_occupancy(rng):
    dens = rng.uniform(0, 1, size=(2048,)).astype(np.float32)
    bf = tmath.packbits_u32(jnp.asarray(dens), 0.5)
    idx = jnp.asarray(rng.randint(0, 2048, size=(500,)))
    got = np.asarray(tmath.bitfield_test(bf, idx))
    np.testing.assert_array_equal(got, (dens > 0.5)[np.asarray(idx)])


def test_bitfield_u8_view(rng):
    dens = rng.uniform(0, 1, size=(1024,)).astype(np.float32)
    bf32 = tmath.packbits_u32(jnp.asarray(dens), 0.5)
    u8 = np.asarray(tmath.bitfield_to_u8(bf32))
    oracle = np.packbits(
        (dens > 0.5).reshape(-1, 8), axis=-1, bitorder="little"
    ).reshape(-1)
    np.testing.assert_array_equal(u8, oracle)


def test_grid_coords_covers_all():
    g = 8
    coords = np.asarray(tmath.grid_coords(g))
    assert coords.shape == (g**3, 3)
    assert len(np.unique(np.asarray(tmath.morton3d(coords)))) == g**3
