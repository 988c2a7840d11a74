"""Gather-free 1D affine resampling — the shear-warp renderer's core op.

``out[..., i] = lerp(x[..., floor(p_i)], x[..., floor(p_i)+1], frac(p_i))``
with ``p_i = start + i * step`` and zero outside ``[0, N-1]``.

TPU has no fast arbitrary gather.  The resample splits the source position
into a *traced integer origin* (absorbed by one ``dynamic_slice``, so the
offset can be anything — it depends on the camera) plus a *residual drift*
``floor(p_i) - origin - i`` whose range depends only on ``|step - 1|`` and
``out_len`` and is therefore static: the residual is resolved by a cascade
of ``jnp.roll`` + ``where`` + 2-term lerp — pure dense VPU work whose
autodiff transpose has the same structure (docs/shear_warp.md).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def residual_window(
    step_min: float, step_max: float, out_len: int
) -> tuple[int, int]:
    """Static bounds of the residual drift for ``step`` in the given range.

    The origin split centers the drift at the output midpoint, so the
    residual spans roughly ``±|step - 1| * out_len / 2``.
    """
    hl = out_len // 2
    cands = []
    for s in (step_min, step_max):
        for i in (0.0, float(out_len - 1)):
            cands.append((s - 1.0) * (i - hl))
    d_min = int(math.floor(min(cands)))
    d_max = int(math.floor(max(cands) + 1.0))  # + frac(center) in [0, 1)
    return d_min, d_max


def resample_affine(
    x: jnp.ndarray,
    start: jnp.ndarray,
    step: jnp.ndarray,
    out_len: int,
    d_min: int,
    d_max: int,
    axis: int = -1,
) -> jnp.ndarray:
    """Affine 1D resample along ``axis`` (zero padding outside the source).

    Args:
        x: input array; resampled along ``axis`` (length N).
        start, step: traced scalars — source position of output index i is
            ``start + i * step`` (in source-sample units).  ``start`` may be
            arbitrary; only ``step``'s deviation from 1 must respect the
            static window.
        out_len: static output length.
        d_min, d_max: static residual-drift bounds from
            :func:`residual_window`.
        axis: axis to resample.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    span = d_max - d_min
    frame = out_len + span + 1
    pad_amt = 2 * frame

    start = jnp.asarray(start, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    hl = out_len // 2
    center = start + step * hl - hl
    origin = jnp.floor(center).astype(jnp.int32)

    i = jnp.arange(out_len, dtype=jnp.float32)
    pos = start + i * step
    base = jnp.floor(pos)
    frac1 = (pos - base).astype(x.dtype)
    in_bounds = (base >= 0) & (base <= n - 1)
    nb_ok = base + 1 <= n - 1
    frac_nb1 = jnp.where(nb_ok, frac1, jnp.zeros_like(frac1))
    # residual drift relative to the sliced frame
    rdrift1 = base.astype(jnp.int32) - origin - jnp.arange(
        out_len, dtype=jnp.int32
    )
    # broadcast the per-index vectors into the target axis (in place — no
    # transposes: channel-leading layouts keep (sublane, lane) dense)
    bshape = [1] * x.ndim
    bshape[axis] = out_len
    frac = frac1.reshape(bshape)
    frac_nb = frac_nb1.reshape(bshape)
    sel_d = rdrift1.reshape(bshape)
    ib = in_bounds.reshape(bshape)

    pad = [(0, 0)] * x.ndim
    pad[axis] = (pad_amt, pad_amt)
    xp = jnp.pad(x, pad)
    # frame covers source indices origin + [d_min, out_len - 1 + d_max + 1]
    off = jnp.clip(origin + d_min + pad_amt, 0, n + 2 * pad_amt - frame)
    xw = jax.lax.dynamic_slice_in_dim(xp, off, frame, axis=axis)

    out_shape = list(x.shape)
    out_shape[axis] = out_len
    out = jnp.zeros(out_shape, x.dtype)
    # within the frame, output i with residual drift d reads frame slot
    # i + (d - d_min); the +1 neighbour is the next roll
    def rolled(k):
        return jax.lax.slice_in_dim(
            jnp.roll(xw, -k, axis=axis), 0, out_len, axis=axis
        )

    cur = rolled(0)
    for k in range(0, span + 1):
        nxt = rolled(k + 1)
        sel = (sel_d == d_min + k) & ib
        val = cur * (1.0 - frac) + nxt * frac_nb
        out = jnp.where(sel, val, out)
        cur = nxt
    return out


def resample_affine_2d(
    x: jnp.ndarray,
    start_r: jnp.ndarray,
    step_r: jnp.ndarray,
    start_c: jnp.ndarray,
    step_c: jnp.ndarray,
    out_shape: tuple[int, int],
    window_r: tuple[int, int],
    window_c: tuple[int, int],
) -> jnp.ndarray:
    """Separable bilinear resample of the two leading axes of ``x``.

    ``x`` is (R, C, ...); returns (out_shape[0], out_shape[1], ...).
    """
    out_r, out_c = out_shape
    y = resample_affine(
        x, start_r, step_r, out_r, window_r[0], window_r[1], axis=0
    )
    return resample_affine(
        y, start_c, step_c, out_c, window_c[0], window_c[1], axis=1
    )


def interp_kernel(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Resampling kernel at signed source distance ``x``.

    "linear": the 2-tap tent (support 1).  "cubic": Catmull-Rom
    (a=-0.5, support 2) — a 4-band matrix instead of 2-band, which the
    DENSE matmul formulation gets for free; each tent in the sweep's
    resample chain convolves ~1 source cell of blur, so the cubic
    kernel is the renderer's sharpness knob at zero FLOP cost.
    """
    ax = jnp.abs(x)
    if kind == "linear":
        return jnp.maximum(0.0, 1.0 - ax)
    assert kind == "cubic", kind
    w1 = (1.5 * ax - 2.5) * ax * ax + 1.0
    w2 = ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def interp_matrix(
    start: jnp.ndarray,
    step: jnp.ndarray,
    n: int,
    out_len: int,
    dtype=jnp.float32,
    kind: str = "linear",
) -> jnp.ndarray:
    """Dense (n, out_len) interpolation matrix.

    ``W[m, i] = k(m - (start + i*step))`` — applying it contracts the
    source axis: ``out = x @ W`` reproduces the affine resample with
    zero-padding semantics.  At moderate sizes (n, out_len <= ~512) the
    banded structure is cheaper to *ignore*: two dense MXU matmuls per slab
    beat a ~100-stage roll-select chain in both compile and run time (the
    roll-select path remains for large grids where n^3 matmul cost bites).
    """
    m = jnp.arange(n, dtype=jnp.float32)[:, None]
    pos = start + jnp.arange(out_len, dtype=jnp.float32)[None, :] * step
    return interp_kernel(m - pos, kind).astype(dtype)


def resample_matmul(
    x: jnp.ndarray,
    start: jnp.ndarray,
    step: jnp.ndarray,
    out_len: int,
    axis: int,
    dtype=None,
    kind: str = "linear",
) -> jnp.ndarray:
    """Affine 1D resample along ``axis`` as one MXU matmul.

    ``dtype`` sets the matmul operand precision (e.g. bfloat16); results
    accumulate in fp32 via ``preferred_element_type``.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    w = interp_matrix(start, step, n, out_len, dtype=dtype or x.dtype,
                      kind=kind)
    out = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((axis,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dtype is not None:
        out = out.astype(dtype)
    # the contracted axis lands at the end; restore position
    return jnp.moveaxis(out, -1, axis)


def resample_matmul_batched(
    x: jnp.ndarray,
    start: jnp.ndarray,
    step: jnp.ndarray,
    out_len: int,
    axis: int,
    dtype=None,
    kind: str = "linear",
) -> jnp.ndarray:
    """Affine 1D resample along ``axis`` with a *per-leading-batch* affine
    map: ``x`` is (B, ..., N, ...), ``start``/``step`` are (B,)-vectors,
    and batch b uses its own interpolation matrix.  One batched MXU
    ``dot_general`` — the shear-warp sweep uses this to resample a slab's
    sigma sub-slab pair (two different world planes) in a single op.
    """
    axis = axis % x.ndim
    assert axis != 0, "axis 0 is the batch dimension"
    n = x.shape[axis]
    m = jnp.arange(n, dtype=jnp.float32)[None, :, None]  # (1, N, 1)
    pos = (
        start[:, None, None]
        + jnp.arange(out_len, dtype=jnp.float32)[None, None, :]
        * step[:, None, None]
    )  # (B, 1, out_len)
    w = interp_kernel(m - pos, kind).astype(dtype or x.dtype)
    out = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((axis,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, <other dims>, out_len)
    if dtype is not None:
        out = out.astype(dtype)
    return jnp.moveaxis(out, -1, axis)


def resample_window(
    step_abs_max: float, out_len: int, multiple: int = 32
) -> int:
    """Static source-window width covering an affine resample's support.

    The support of ``out[0..out_len-1]`` spans ``(out_len-1)*|step| + 2``
    source cells; bucketing to a multiple keeps the number of compiled
    programs small when the step varies across poses.
    """
    need = int(math.ceil((out_len - 1) * step_abs_max)) + 3
    return ((need + multiple - 1) // multiple) * multiple


def resample_matmul_windowed(
    x: jnp.ndarray,
    start: jnp.ndarray,
    step: jnp.ndarray,
    out_len: int,
    axis: int,
    window: int,
    dtype=None,
) -> jnp.ndarray:
    """Affine 1D resample as dynamic-slice + one small MXU matmul.

    The interpolation matrix of :func:`resample_matmul` is a 2-diagonal
    band: only ``(out_len-1)*|step| + 2`` consecutive source cells are ever
    read.  Slicing that window first (traced offset, static ``window``
    width) shrinks the matmul from ``(N, out_len)`` to ``(window,
    out_len)`` — the big win when the output footprint covers a small part
    of the source (training crops, tight frusta).

    ``window`` must cover the support (see :func:`resample_window`);
    positions outside the window read as zero, matching the zero-padding
    semantics of the full matmul only when the window is wide enough.
    Falls back to the full matmul when ``window >= N``.
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    if window >= n:
        return resample_matmul(x, start, step, out_len, axis, dtype)
    start = jnp.asarray(start, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    p_end = start + (out_len - 1) * step
    lo = jnp.minimum(start, p_end)
    origin = jnp.floor(lo).astype(jnp.int32) - 1
    pad = [(0, 0)] * x.ndim
    pad[axis] = (window, window)
    xp = jnp.pad(x, pad)
    off = jnp.clip(origin + window, 0, n + window)
    xw = jax.lax.dynamic_slice_in_dim(xp, off, window, axis=axis)
    rel_start = start - (off - window).astype(jnp.float32)
    w = interp_matrix(
        rel_start, step, window, out_len, dtype=dtype or x.dtype
    )
    out = jax.lax.dot_general(
        xw,
        w,
        dimension_numbers=(((axis,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dtype is not None:
        out = out.astype(dtype)
    return jnp.moveaxis(out, -1, axis)


# kept for callers that can bound ``start`` statically (legacy helper)
def drift_window(
    start_min: float, start_max: float, step_min: float, step_max: float,
    out_len: int,
) -> tuple[int, int]:
    """Static residual window — ``start`` bounds no longer matter (the
    origin split absorbs them); retained for API compatibility."""
    del start_min, start_max
    return residual_window(step_min, step_max, out_len)
