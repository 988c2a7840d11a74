"""Mip-NeRF-360 distortion loss (DVGO-v2 formulation) — TPU-native.

Rebuild of the reference's four serial Taichi kernels
(``modules/distortion.py:15-119``: per-ray prefix sums, elementwise loss,
per-ray reduce, hand-derived backward) as masked parallel cumulative sums
over the dense ``(N_rays, S)`` sample grid.  Per sample:

    loss_s = 2 * (wts_inc_s * ws_exc_s - ws_inc_s * wts_exc_s)
             + (1/3) * w_s^2 * delta_s

summed per ray (``distortion.py:45-84``).  Autodiff through the cumsums
reproduces the reference's hand-written ``distortion_loss_bw_kernel``
gradient w.r.t. ``ws`` exactly (and, unlike the reference, is also correct
if ``deltas``/``ts`` ever need gradients).
"""

from __future__ import annotations

import jax.numpy as jnp


def distortion_loss(
    ws: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Per-ray distortion loss.

    Args:
        ws: (N, S) sample weights.
        deltas: (N, S) intervals.
        ts: (N, S) midpoints.
        valid: (N, S) bool sample validity.
    Returns:
        (N,) per-ray loss.
    """
    w = jnp.where(valid, ws, 0.0)
    wt = w * ts
    ws_inc = jnp.cumsum(w, axis=-1)
    wts_inc = jnp.cumsum(wt, axis=-1)
    ws_exc = ws_inc - w
    wts_exc = wts_inc - wt
    per_sample = 2.0 * (wts_inc * ws_exc - ws_inc * wts_exc) + (
        1.0 / 3.0
    ) * w * w * jnp.where(valid, deltas, 0.0)
    return jnp.sum(jnp.where(valid, per_sample, 0.0), axis=-1)
