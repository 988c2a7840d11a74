"""Core integer/bit math for the occupancy grid, fully vectorized in JAX.

TPU-native rebuild of the reference's Taichi utility kernels
(``modules/utils.py:49-169``): morton encode/invert, the bit-level frexp used
for cascade (mip) selection, the marching step-size schedule, and bitfield
packing.  The reference packs occupancy into ``uint8`` bytes; we pack into
``uint32`` words (TPU has no efficient 8-bit lane type) — bit ``i`` of word
``w`` is cell ``32*w + i``, which is bit-for-bit the same little-endian layout
as the reference's ``(idx//8, idx%8)`` addressing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MAX_SAMPLES, SQRT3

SQRT3_MAX_SAMPLES = SQRT3 / MAX_SAMPLES  # reference: modules/utils.py:15
SQRT3_2 = 2.0 * SQRT3  # reference: modules/utils.py:16


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of ``v`` (uint32) to every 3rd bit.

    Reference: ``modules/utils.py:96-101``.
    """
    v = jnp.asarray(v, jnp.uint32)
    v = (v * _u32(0x00010001)) & _u32(0xFF0000FF)
    v = (v * _u32(0x00000101)) & _u32(0x0F00F00F)
    v = (v * _u32(0x00000011)) & _u32(0xC30C30C3)
    v = (v * _u32(0x00000005)) & _u32(0x49249249)
    return v


def morton3d(xyz: jnp.ndarray) -> jnp.ndarray:
    """Interleave xyz integer coords into a morton code.

    Args:
        xyz: (..., 3) integer coords in [0, 1024).
    Returns:
        (...,) int32 morton codes.  Reference: ``modules/utils.py:104-107``.
    """
    xyz = jnp.asarray(xyz, jnp.uint32)
    e = expand_bits(xyz)
    code = e[..., 0] | (e[..., 1] << 1) | (e[..., 2] << 2)
    return code.astype(jnp.int32)


def _compress_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = x & _u32(0x49249249)
    x = (x | (x >> 2)) & _u32(0xC30C30C3)
    x = (x | (x >> 4)) & _u32(0x0F00F00F)
    x = (x | (x >> 8)) & _u32(0xFF0000FF)
    x = (x | (x >> 16)) & _u32(0x0000FFFF)
    return x


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """Invert morton codes back to (..., 3) int32 coords.

    Reference: ``modules/utils.py:110-127``.
    """
    codes = jnp.asarray(codes, jnp.uint32)
    x = _compress_bits(codes)
    y = _compress_bits(codes >> 1)
    z = _compress_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def frexp_exponent(x: jnp.ndarray) -> jnp.ndarray:
    """Exponent ``e`` such that ``x = f * 2**e`` with ``f in (0.5, 1]``.

    Bit-level float decomposition matching the reference exactly
    (``modules/utils.py:60-75``): IEEE-754 exponent extraction, bumped by one
    unless the mantissa is exactly a power of two.  Returns 0 for x == 0.
    """
    x = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    exponent = (((bits & _u32(0x7F800000)) >> 23)).astype(jnp.int32) - 127
    frac_bits = (bits & _u32(0x007FFFFF)) | _u32(0x3F800000)
    frac = jax.lax.bitcast_convert_type(frac_bits, jnp.float32)  # in [1, 2)
    exponent = jnp.where(frac > 1.0, exponent + 1, exponent)
    return jnp.where(x == 0.0, 0, exponent)


def mip_from_pos(xyz: jnp.ndarray, cascades: int) -> jnp.ndarray:
    """Cascade selection from position (reference: modules/utils.py:78-84)."""
    mx = jnp.max(jnp.abs(xyz), axis=-1)
    exponent = frexp_exponent(mx) + 1
    return jnp.clip(exponent, 0, cascades - 1)


def mip_from_dt(dt: jnp.ndarray, grid_size: int, cascades: int) -> jnp.ndarray:
    """Cascade selection from step size (reference: modules/utils.py:87-92)."""
    exponent = frexp_exponent(dt * grid_size)
    return jnp.clip(exponent, 0, cascades - 1)


def calc_dt(
    t: jnp.ndarray, exp_step_factor: float, grid_size: int, scale: float
) -> jnp.ndarray:
    """Marching step size schedule (reference: modules/utils.py:54-57)."""
    return jnp.clip(
        t * exp_step_factor, SQRT3_MAX_SAMPLES, SQRT3_2 * scale / grid_size
    )


def packbits_u32(density_grid: jnp.ndarray, threshold) -> jnp.ndarray:
    """Pack per-cell occupancy (density > threshold) into uint32 words.

    Args:
        density_grid: (n_cells,) float densities, n_cells % 32 == 0.
        threshold: scalar density threshold.
    Returns:
        (n_cells // 32,) uint32 bitfield.  Same bit layout as the reference's
        uint8 field (``modules/utils.py:157-169``), 4 bytes per word.
    """
    occ = (density_grid > threshold).reshape(-1, 32).astype(jnp.uint32)
    weights = _u32(1) << jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(occ * weights[None, :], axis=-1, dtype=jnp.uint32)


def bitfield_test(bitfield: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Test occupancy bit ``idx`` in a uint32-packed bitfield.

    Reference probes bytes (``modules/ray_march.py:61``); this probes words.
    """
    idx = jnp.asarray(idx, jnp.uint32)
    word = bitfield[(idx >> 5).astype(jnp.int32)]
    return ((word >> (idx & _u32(31))) & _u32(1)).astype(jnp.bool_)


def bitfield_to_u8(bitfield_u32: jnp.ndarray) -> jnp.ndarray:
    """View a uint32 bitfield as the reference's uint8 layout (for export)."""
    w = jnp.asarray(bitfield_u32, jnp.uint32)
    bytes_ = jnp.stack(
        [(w >> (8 * i)) & _u32(0xFF) for i in range(4)], axis=-1
    )
    return bytes_.reshape(-1).astype(jnp.uint8)


def morton3d_np(xyz) -> "np.ndarray":
    """Numpy morton encode — host-side precomputation of static cell
    permutations (embedding a folded literal instead of a 2M-element
    bit-op chain keeps XLA compile times sane)."""
    import numpy as np

    v = np.asarray(xyz, np.uint32)

    def expand(v):
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    e = expand(v)
    return (
        e[..., 0] | (e[..., 1] << np.uint32(1)) | (e[..., 2] << np.uint32(2))
    ).astype(np.int32)


def grid_coords_np(grid_size: int) -> "np.ndarray":
    """Numpy meshgrid coordinates (host-side static)."""
    import numpy as np

    g = np.arange(grid_size, dtype=np.int32)
    z, y, x = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([x, y, z], axis=-1).reshape(-1, 3)


def grid_coords(grid_size: int) -> jnp.ndarray:
    """Dense (G^3, 3) int32 meshgrid coordinates, x-fastest ordering.

    Matches kornia ``create_meshgrid3d(...).reshape(-1, 3)`` as used by the
    reference (``modules/networks.py:77-86``), whose last axis is (x, y, z)
    with x varying fastest.
    """
    g = jnp.arange(grid_size, dtype=jnp.int32)
    z, y, x = jnp.meshgrid(g, g, g, indexing="ij")
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
