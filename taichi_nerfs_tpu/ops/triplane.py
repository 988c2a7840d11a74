"""Tri-plane positional encoder — TPU-native.

Rebuild of the reference's Taichi triplane kernel
(``modules/triplane.py:12-100``): three axis-aligned feature planes (XY, YZ,
ZX) stored in one flat table of ``max_res**2 * 3 * F`` params; per (sample,
level, feature) a bilinear 4-corner gather on each plane — with corner coords
upscaled into max_res indexing (``triplane.py:72-82``) — and the output is the
elementwise *product* of the three plane features (``:94-98``).

Output layout matches the reference: ``out[i, j * levels + level]`` for
feature ``j`` (``triplane.py:43-44,98``) — feature-major, unlike the hash
encoder's level-major layout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import TriPlaneConfig


def init_triplane_table(key: jax.Array, cfg: TriPlaneConfig) -> jnp.ndarray:
    """U[0,1] init (reference: triplane.py:129-136).

    Shape (3, max_res**2, F): plane-major view of the reference's flat table
    (``plane_base = offset * fd``, ``index_base = index * feat_dim``).
    """
    return jax.random.uniform(
        key,
        (3, cfg.max_res**2, cfg.feature_per_level),
        dtype=jnp.float32,
    )


def triplane_encode(
    table: jnp.ndarray, xyz: jnp.ndarray, cfg: TriPlaneConfig
) -> jnp.ndarray:
    """Encode normalized positions through the tri-plane pyramid.

    Args:
        table: (3, max_res**2, F) plane features.
        xyz: (..., 3) positions normalized to [0, 1].
    Returns:
        (..., levels * F) features (feature-major layout, see module doc).
    """
    max_res = cfg.max_res
    # plane uv coords: XY, YZ, ZX (reference: triplane.py:46-50)
    uv = jnp.stack(
        [
            jnp.stack([xyz[..., 0], xyz[..., 1]], axis=-1),
            jnp.stack([xyz[..., 1], xyz[..., 2]], axis=-1),
            jnp.stack([xyz[..., 2], xyz[..., 0]], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 2)

    per_level = []
    for level in range(cfg.levels):
        scale = cfg.base_res * math.exp(level * cfg.log_b) - 1.0
        res = int(math.ceil(scale)) + 1  # grid_resolution (triplane.py:31-33)

        pos = uv * jnp.float32(res - 1) + 0.5  # (..., 3, 2)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.uint32)

        acc = None  # (..., 3, F) per-plane bilinear features
        for corner in range(4):
            sel = jnp.asarray(
                [(corner >> d) & 1 for d in range(2)], jnp.uint32
            )
            cuv = pos_grid + sel  # (..., 3, 2)
            w = jnp.ones(uv.shape[:-1], xyz.dtype)  # (..., 3)
            for d in range(2):
                w = w * jnp.where(
                    (corner >> d) & 1, frac[..., d], 1.0 - frac[..., d]
                )
            # upscale corner coords into max_res indexing (triplane.py:72-82)
            cuv_hi = (
                cuv.astype(jnp.float32) / res * (max_res - 1)
            ).astype(jnp.uint32)
            idx = (cuv_hi[..., 0] + cuv_hi[..., 1] * jnp.uint32(max_res)).astype(
                jnp.int32
            )  # (..., 3)
            planes = []
            for fd in range(3):
                planes.append(jnp.take(table[fd], idx[..., fd], axis=0))
            f = jnp.stack(planes, axis=-2)  # (..., 3, F)
            term = w[..., None] * f
            acc = term if acc is None else acc + term
        per_level.append(jnp.prod(acc, axis=-2))  # (..., F)

    # (..., levels, F) -> feature-major (..., F, levels) -> flat
    out = jnp.stack(per_level, axis=-2)
    out = jnp.swapaxes(out, -1, -2)
    return out.reshape(*xyz.shape[:-1], cfg.levels * cfg.feature_per_level)
