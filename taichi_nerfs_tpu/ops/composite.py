"""Volume-rendering compositing — TPU-native.

Rebuild of the reference's serial per-ray Taichi compositors
(``modules/volume_train.py:6-48``, ``modules/volume_render_test.py:4-55``).
The reference walks each ray's packed samples front-to-back in a scalar loop,
carrying transmittance and early-stopping at ``T <= T_threshold``; its
backward replays the kernel through Taichi reverse-mode AD.

Here compositing is a masked exclusive cumulative product over the dense
``(N_rays, S)`` sample grid — a parallel scan XLA schedules on the VPU — and
the early-stop becomes a contribution mask ``T > threshold`` (identical
output: once transmittance crosses the threshold the reference adds nothing
further, and ``T`` is monotonically non-increasing).  Gradients come from
plain autodiff of the scan; no custom VJP, no stored transmittance chain.

The transmittance chain is computed in log space:
``prod_{k<s}(1 - alpha_k) = exp(-sum_{k<s} sigma_k * delta_k)`` — exactly
equal analytically, numerically better behaved, and critically it keeps
``jnp.cumprod`` out of the autodiff graph: cumprod's JVP/transpose
expansion sends XLA's compile of the fused train-step backward from ~30 s
to ~250 s (measured on v5e), while cumsum's transpose (a reversed cumsum)
is trivial.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompositeResult(NamedTuple):
    opacity: jnp.ndarray  # (N,)
    depth: jnp.ndarray  # (N,)
    rgb: jnp.ndarray  # (N, 3)
    ws: jnp.ndarray  # (N, S) per-sample weights
    vr_samples: jnp.ndarray  # () total contributing samples


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """prod_{k < s} x_k with 1 at the first slot.

    Kept for API/tests; the hot path uses :func:`exclusive_transmittance`
    (log-space) instead — see module docstring.
    """
    inc = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jnp.take(inc, jnp.asarray([0]), axis=axis))
    return jnp.concatenate(
        [one, jnp.take(inc, jnp.arange(x.shape[axis] - 1), axis=axis)],
        axis=axis,
    )


def exclusive_transmittance(optical_depth: jnp.ndarray) -> jnp.ndarray:
    """``T_s = exp(-sum_{k<s} tau_k)`` along the last axis (T_0 = 1)."""
    acc = jnp.cumsum(optical_depth, axis=-1)
    acc_exc = acc - optical_depth  # exclusive prefix
    return jnp.exp(-acc_exc)


def composite_train(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
    t_threshold: float,
    t_in: jnp.ndarray | None = None,
) -> CompositeResult:
    """Front-to-back composite of a dense masked sample grid.

    Args:
        sigmas: (N, S) densities.
        rgbs: (N, S, 3) colors.
        deltas, ts: (N, S) intervals and midpoints.
        valid: (N, S) bool sample validity.
        t_threshold: stop contributing once transmittance <= this
            (reference: volume_train.py:38).
        t_in: (N,) optional incoming transmittance (test renderer resumes
            from ``1 - opacity``, reference: volume_render_test.py:26).
    """
    tau = jnp.where(valid, sigmas * deltas, 0.0)
    alpha = 1.0 - jnp.exp(-tau)
    trans = exclusive_transmittance(tau)
    if t_in is not None:
        trans = trans * t_in[:, None]
    contrib = valid & (trans > t_threshold)
    w = jnp.where(contrib, alpha * trans, 0.0)
    opacity = jnp.sum(w, axis=-1)
    depth = jnp.sum(w * ts, axis=-1)
    rgb = jnp.sum(w[..., None] * rgbs, axis=-2)
    vr_samples = jnp.sum(contrib)
    return CompositeResult(
        opacity=opacity, depth=depth, rgb=rgb, ws=w, vr_samples=vr_samples
    )


def apply_background(
    rgb: jnp.ndarray, opacity: jnp.ndarray, rgb_bg: jnp.ndarray
) -> jnp.ndarray:
    """Blend the background color (reference: rendering.py:219-226)."""
    return rgb + rgb_bg * (1.0 - opacity)[..., None]


def composite_test_round(
    sigmas: jnp.ndarray,
    rgbs: jnp.ndarray,
    deltas: jnp.ndarray,
    ts: jnp.ndarray,
    valid: jnp.ndarray,
    t_threshold: float,
    opacity: jnp.ndarray,
    depth: jnp.ndarray,
    rgb: jnp.ndarray,
):
    """One round of the incremental test-time compositor.

    Resumes each ray's transmittance from ``1 - opacity`` and accumulates
    into the persistent images, marking rays converged when transmittance
    falls below the threshold (reference: volume_render_test.py:23-55).

    Returns updated (opacity, depth, rgb, converged) where ``converged`` is
    the per-ray T <= threshold flag after this round.
    """
    t_in = 1.0 - opacity
    res = composite_train(
        sigmas, rgbs, deltas, ts, valid, t_threshold, t_in=t_in
    )
    opacity = opacity + res.opacity
    depth = depth + res.depth
    rgb = rgb + res.rgb
    converged = (1.0 - opacity) <= t_threshold
    return opacity, depth, rgb, converged
