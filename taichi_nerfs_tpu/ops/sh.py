"""Real spherical-harmonics direction encoding (degree 4, 16 components).

TPU-native rebuild of the reference's Taichi SH kernel
(``modules/spherical_harmonics.py:7-59``) as a pure vectorized jnp function —
autodiff flows through it for free (the reference's hand-rolled
``DirEncoder.backward`` returned an unpopulated grad, a defect we do not
replicate).  Also provides the polynomial ``eval_sh`` used by the voxel-grid
model (``modules/sh_utils.py:58-113``).

The SH basis constants and the ``eval_sh`` polynomial derive from the
PlenOctree codebase (the same lineage the reference's ``sh_utils.py``
retains):

  Copyright 2021 PlenOctree Authors.  Redistribution and use in source
  and binary forms, with or without modification, are permitted provided
  the conditions of the PlenOctree BSD 2-Clause license are met
  (https://github.com/sxyu/plenoctree/blob/master/LICENSE).
  THIS SOFTWARE IS PROVIDED BY THE COPYRIGHT HOLDERS AND CONTRIBUTORS
  "AS IS" WITHOUT WARRANTY OF ANY KIND.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_OUT_DIM = 16

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_encode(dirs: jnp.ndarray) -> jnp.ndarray:
    """Degree-4 (16 component) SH basis, reference coefficient-for-coefficient.

    Note the reference feeds ``(d + 1) / 2`` (a [0,1]-mapped direction) into
    this basis (``modules/networks.py:163``) — instant-ngp convention.  This
    function evaluates the raw basis; the caller does the remap.

    Args:
        dirs: (..., 3) inputs.
    Returns:
        (..., 16) encoding.  Reference: modules/spherical_harmonics.py:15-42.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    return jnp.stack(
        [
            jnp.full_like(x, 0.28209479177387814),
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ],
        axis=-1,
    )


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH coefficients at unit directions (PlenOctree convention).

    Args:
        deg: 0..4.
        sh: (..., (deg+1)**2) coefficients.
        dirs: (..., 3) unit directions.
    Returns:
        (...,) values.  Reference: ``modules/sh_utils.py:58-113``.
    """
    assert 4 >= deg >= 0
    assert (deg + 1) ** 2 == sh.shape[-1]

    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        result = (
            result
            - C1 * y * sh[..., 1]
            + C1 * z * sh[..., 2]
            - C1 * x * sh[..., 3]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4]
                + C2[1] * yz * sh[..., 5]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                + C2[3] * xz * sh[..., 7]
                + C2[4] * (xx - yy) * sh[..., 8]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                    + C3[1] * xy * z * sh[..., 10]
                    + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                    + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                    + C3[5] * z * (xx - yy) * sh[..., 14]
                    + C3[6] * x * (xx - 3 * yy) * sh[..., 15]
                )
                if deg > 3:
                    result = (
                        result
                        + C4[0] * xy * (xx - yy) * sh[..., 16]
                        + C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                        + C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                        + C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                        + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                        + C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                        + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                        + C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                        + C4[8]
                        * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))
                        * sh[..., 24]
                    )
    return result


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reference: modules/sh_utils.py:115-116."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """Reference: modules/sh_utils.py:118-119."""
    return sh * C0 + 0.5
