"""Pallas TPU kernel: fused shear-warp chunk sweep (forward + custom VJP).

The XLA formulation of the slab sweep (``render/swr.py`` ``chunk_body``) is
a ``lax.scan`` whose carry (the chunk frame) round-trips HBM every slab and
whose remat backward re-runs each slab's resample twice — measured ~5x off
the resample matmuls' MXU roofline.  This kernel fuses one whole *chunk*
(``dc`` slabs) into a single Pallas program:

* grid = (n_chunks, dc); slabs stream HBM -> VMEM (auto-pipelined block),
* the two per-slab affine resamples are MXU matmuls against hat-function
  interpolation matrices built in-register from scalar (start, step) pairs
  (``ops/warp.py:interp_matrix`` semantics); operand dtype is threaded
  from the caller's ``resample_dtype``, fp32 accumulation either way,
* the composite carry (accumulated features, depth, transmittance-log tau)
  lives in VMEM for the whole chunk — zero HBM carry traffic,
* the backward pass is a single *reverse* sweep per chunk (no remat, no
  stored per-slab activations): transmittance is reconstructed exactly in
  log space (``T_k = exp(-(tau_N - sum_{j>=k} sigma_j dt))``) and the
  downstream-suffix term uses the normalized running sum
  ``U_k = (1-a_k) U_{k+1} + a_k phi_k`` so ``dL/da_k = T_k (phi_k - U_{k+1})``.

Scope (the flagship train/bench configuration — ``render_swr_fixed_axis``
dispatches here on TPU and falls back to the XLA scan otherwise): outside
camera, deferred shading, unsplit grid, no distortion accumulation,
full-matmul resample (slab_window == 0), no slab skipping.

Layouts are **channel-leading** everywhere: the slab volume enters as
``(n_chunks, dc, F, Rb, Rc)`` and the chunk frames leave as
``(n_chunks, F+2, nq, nq)`` with channels ``[acc(F-1) | depth | opacity |
tau]`` on the leading axis.  Every per-channel access is then a major-dim
index and every vector op runs on dense ``(nq, nq)``/(Rb, Rc)`` minor
tiles — a channel-in-the-middle layout costs a Mosaic relayout per slab
(measured ~5x the kernel's whole compute budget).

Reference behavior being matched: the per-slab composite of
``modules/volume_train.py:6-48`` restructured object-order (slabs instead
of ray samples), with the dt/t_ray geometry of ``render/swr.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _compiler_params(interpret: bool):
    # the backward holds fwd-frame + grad-frame blocks alongside the slab
    # pipeline; the conservative 16 MB default scoped-VMEM limit is too
    # small at flagship sizes (v5e/v5p have 128 MiB physical VMEM)
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _iota_f32(shape, dim):
    # Mosaic's tpu.iota is integer-only; cast after
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32
    )


def _kern(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Resampling weight at signed source distance ``x`` — in-register
    mirror of ``ops/warp.py:interp_kernel`` ("linear" 2-tap tent,
    "cubic" Catmull-Rom a=-0.5, 4-band).  Pure VPU polynomial work."""
    ax = jnp.abs(x)
    if kind == "linear":
        return jnp.maximum(0.0, 1.0 - ax)
    assert kind == "cubic", kind
    w1 = (1.5 * ax - 2.5) * ax * ax + 1.0
    w2 = ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _interp_T(start, step, nq: int, n: int, dtype, kind: str):
    """(nq, n) interpolation matrix W[i, m] = k(m - (start + i*step))."""
    i = _iota_f32((nq, n), 0)
    m = _iota_f32((nq, n), 1)
    return _kern(m - (start + i * step), kind).astype(dtype)


def _interp(start, step, n: int, nq: int, dtype, kind: str):
    """(n, nq) interpolation matrix W[m, i] = k(m - (start + i*step))."""
    m = _iota_f32((n, nq), 0)
    i = _iota_f32((n, nq), 1)
    return _kern(m - (start + i * step), kind).astype(dtype)


def _geom(chp, nq: int):
    """Per-chunk ray geometry on the lattice.

    Returns ``dt`` (step length) and ``tb = norm / va`` (the per-ray
    depth factor: ``t_ray = z_rel * tb``).  Both are chunk constants —
    kernels compute them once at slab 0 and park them in scratch.
    """
    b0r, db, c0r, dcc, va, h = (
        chp[0], chp[1], chp[2], chp[3], chp[4], chp[5],
    )
    vb = b0r + db * _iota_f32((nq, nq), 0)
    vc = c0r + dcc * _iota_f32((nq, nq), 1)
    norm = jnp.sqrt(va * va + vb * vb + vc * vc)
    dt = h * norm / jnp.abs(va)
    tb = norm / va
    return dt, tb


def _scalars(ref, s):
    """Per-slab (start_b, step_b, start_c, step_c) from SMEM."""
    return tuple(ref[0, s, k] for k in range(4))


def _fwd_kernel(
    rs_ref,  # SMEM (1, dc, 4): per-slab resample params
    zrel_ref,  # SMEM (1, 1, dc): z_k - o_a
    chp_ref,  # SMEM (1, 1, 6): per-chunk [b0-o_b, db, c0-o_c, dc, va, h]
    vol_ref,  # VMEM (1, 1, F, Rb, Rc)
    out_ref,  # VMEM (1, F+2, nq, nq)
    tau_ref,  # scratch (nq, nq): accumulated sigma*dt (bwd resume point)
    t_ref,  # scratch (nq, nq): running transmittance (multiplicative)
    dt_ref,  # scratch (nq, nq): per-chunk step length
    tb_ref,  # scratch (nq, nq): per-chunk depth factor norm/va
    *,
    nq: int,
    dc: int,
    Rb: int,
    F: int,
    Rc: int,
    dtype,
    kind: str,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        tau_ref[...] = jnp.zeros_like(tau_ref)
        t_ref[...] = jnp.ones_like(t_ref)
        chp = tuple(chp_ref[0, 0, k] for k in range(6))
        dt, tb = _geom(chp, nq)
        dt_ref[...] = dt
        tb_ref[...] = tb

    start_b, step_b, start_c, step_c = _scalars(rs_ref, s)
    wbt = _interp_T(start_b, step_b, nq, Rb, dtype, kind)  # (nq, Rb)
    wc = _interp(start_c, step_c, Rc, nq, dtype, kind)  # (Rc, nq)

    def resample(f):
        x1 = jnp.dot(
            wbt,
            vol_ref[0, 0, f].astype(dtype),
            preferred_element_type=jnp.float32,
        )  # (nq, Rc)
        return jnp.dot(
            x1.astype(dtype), wc, preferred_element_type=jnp.float32
        )  # (nq, nq)

    sigma = jnp.maximum(resample(0), 0.0)
    sdt = sigma * dt_ref[...]
    one_m_a = jnp.exp(-sdt)
    t = t_ref[...]
    w = (1.0 - one_m_a) * t
    for f in range(1, F):
        out_ref[0, f - 1] += w * resample(f)
    out_ref[0, F - 1] += w * (zrel_ref[0, 0, s] * tb_ref[...])
    t_ref[...] = t * one_m_a
    tau_ref[...] += sdt

    @pl.when(s == dc - 1)
    def _():
        out_ref[0, F] = 1.0 - t_ref[...]
        out_ref[0, F + 1] = tau_ref[...]


def _bwd_kernel(
    rs_ref,  # SMEM (1, dc, 4): per-slab resample params
    zrel_ref,  # SMEM (1, 1, dc)
    chp_ref,  # SMEM (1, 1, 6)
    vol_ref,  # VMEM (1, 1, F, Rb, Rc) — reversed slab order
    g_ref,  # VMEM (1, F+2, nq, nq): upstream frame grads
    fr_ref,  # VMEM (1, F+2, nq, nq): forward frames (for tau_N)
    dvol_ref,  # VMEM out (1, 1, F, Rb, Rc) — reversed
    tau_ref,  # scratch (nq, nq): tau at the *end* of the unprocessed prefix
    u_ref,  # scratch (nq, nq): normalized downstream suffix U_{k+1}
    dt_ref,  # scratch (nq, nq): per-chunk step length
    tb_ref,  # scratch (nq, nq): per-chunk depth factor norm/va
    *,
    nq: int,
    dc: int,
    Rb: int,
    F: int,
    Rc: int,
    dtype,
    kind: str,
):
    s = pl.program_id(1)
    sr = dc - 1 - s  # the slab this program processes (reverse sweep)

    @pl.when(s == 0)
    def _():
        tau_ref[...] = fr_ref[0, F + 1]
        u_ref[...] = jnp.zeros_like(u_ref)
        chp = tuple(chp_ref[0, 0, k] for k in range(6))
        dt, tb = _geom(chp, nq)
        dt_ref[...] = dt
        tb_ref[...] = tb

    start_b, step_b, start_c, step_c = _scalars(rs_ref, sr)
    wbt = _interp_T(start_b, step_b, nq, Rb, dtype, kind)  # (nq, Rb)
    wc = _interp(start_c, step_c, Rc, nq, dtype, kind)  # (Rc, nq)

    def resample(f):
        x1 = jnp.dot(
            wbt,
            vol_ref[0, 0, f].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.dot(
            x1.astype(dtype), wc, preferred_element_type=jnp.float32
        )

    x2_sigma = resample(0)
    # the clamp binds under cubic undershoot (Catmull-Rom's negative
    # lobes): tau MUST be reconstructed from CLAMPED sigmas (matching
    # the forward's tau accumulation) and d alpha/d sigma gated on
    # x2_sigma > 0, or the log-space transmittance replay diverges
    # from the forward exactly where the kernel undershoots
    sigma = jnp.maximum(x2_sigma, 0.0)
    dt = dt_ref[...]
    t_ray = zrel_ref[0, 0, sr] * tb_ref[...]
    sdt = sigma * dt
    one_m_a = jnp.exp(-sdt)
    a = 1.0 - one_m_a
    # tau before this slab: subtract its own contribution from the suffix
    tau_k = tau_ref[...] - sdt
    t_k = jnp.exp(-tau_k)
    w = a * t_k

    g_dep = g_ref[0, F - 1]
    g_op = g_ref[0, F]
    g_tau = g_ref[0, F + 1]
    phi = t_ray * g_dep + g_op
    feats = []
    for f in range(1, F):
        xf = resample(f)
        feats.append(xf)
        phi += xf * g_ref[0, f - 1]
    da = t_k * (phi - u_ref[...])
    # tau_N = sum_k sigma_k dt_k is linear in sigma: d tau/d sigma_k = dt
    dsigma = da * one_m_a * dt + g_tau * dt
    # d x2: sigma channel (clamp subgradient) + weighted feature channels
    dx2_sigma = jnp.where(x2_sigma > 0.0, dsigma, 0.0)

    # transposed resamples back to the slab: dvol = wb @ (dx2 @ wct)
    wct = _interp_T(start_c, step_c, nq, Rc, dtype, kind)  # (nq, Rc)
    wb = _interp(start_b, step_b, Rb, nq, dtype, kind)  # (Rb, nq)

    def back(dx2, f):
        t = jnp.dot(
            dx2.astype(dtype), wct, preferred_element_type=jnp.float32
        )  # (nq, Rc)
        dvol_ref[0, 0, f] = jnp.dot(
            wb, t.astype(dtype), preferred_element_type=jnp.float32
        ).astype(dvol_ref.dtype)  # (Rb, Rc); cotangent dtype == primal's

    back(dx2_sigma, 0)
    for f in range(1, F):
        back(w * g_ref[0, f - 1], f)

    # carry updates for the next (earlier) slab
    tau_ref[...] = tau_k
    u_ref[...] = one_m_a * u_ref[...] + a * phi


# SMEM blocks cover the full trailing axes (Mosaic requires the last two
# block dims to equal the array's); per-slab scalars are read with a
# dynamic index inside the kernel
def _smem_specs(dc: int):
    return [
        pl.BlockSpec(
            (1, dc, 4), lambda c, s: (c, 0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, 1, dc), lambda c, s: (c, 0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, 1, 6), lambda c, s: (c, 0, 0), memory_space=pltpu.SMEM
        ),
    ]


def _fwd_call(
    vol_cs, rs_par, z_rel, ch_par, *, nq, dtype, interpret, kind
):
    n_chunks, dc, F, Rb, Rc = vol_cs.shape
    kernel = functools.partial(
        _fwd_kernel, nq=nq, dc=dc, Rb=Rb, F=F, Rc=Rc, dtype=dtype,
        kind=kind,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks, dc),
        in_specs=_smem_specs(dc)
        + [
            pl.BlockSpec(
                (1, 1, F, Rb, Rc), lambda c, s: (c, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, F + 2, nq, nq), lambda c, s: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks, F + 2, nq, nq), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((nq, nq), jnp.float32) for _ in range(4)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(rs_par, z_rel[:, None, :], ch_par[:, None, :], vol_cs)


def _bwd_call(
    vol_cs, rs_par, z_rel, ch_par, frames, g, *, nq, dtype, interpret,
    kind,
):
    n_chunks, dc, F, Rb, Rc = vol_cs.shape
    kernel = functools.partial(
        _bwd_kernel, nq=nq, dc=dc, Rb=Rb, F=F, Rc=Rc, dtype=dtype,
        kind=kind,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks, dc),
        in_specs=_smem_specs(dc)
        + [
            pl.BlockSpec(
                (1, 1, F, Rb, Rc),
                lambda c, s: (c, dc - 1 - s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, F + 2, nq, nq), lambda c, s: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, F + 2, nq, nq), lambda c, s: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, F, Rb, Rc),
            lambda c, s: (c, dc - 1 - s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(vol_cs.shape, vol_cs.dtype),
        scratch_shapes=[
            pltpu.VMEM((nq, nq), jnp.float32) for _ in range(4)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(rs_par, z_rel[:, None, :], ch_par[:, None, :], vol_cs, g, frames)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def chunk_sweep(
    vol_cs: jnp.ndarray,  # (n_chunks, dc, F, Rb, Rc) f32
    rs_par: jnp.ndarray,  # (n_chunks, dc, 4) f32
    z_rel: jnp.ndarray,  # (n_chunks, dc) f32
    ch_par: jnp.ndarray,  # (n_chunks, 6) f32
    nq: int,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    kind: str = "linear",
) -> jnp.ndarray:
    """Composite every chunk's slabs into per-chunk frames.

    Returns (n_chunks, F+2, nq, nq) frames with channels
    ``[acc features (F-1) | depth | opacity | tau]``.

    Differentiability: only ``vol_cs`` carries gradient.  ``rs_par``,
    ``z_rel``, ``ch_par`` are camera functions and are NOT differentiable
    through this op — the VJP returns zero cotangents for them (the
    reference treats sample positions the same way,
    hash_encoder.py:264-279).  Callers optimizing camera parameters must
    not route their gradient through this kernel.  All four output
    channels carry gradient, including ``tau`` (``d tau/d sigma_k = dt``).

    ``dtype`` is the resample-matmul operand dtype; pass ``jnp.float32``
    to mirror the XLA path's default ``resample_dtype='float32'`` (on v5e
    both run as bf16 MXU passes; the distinction matters on hardware with
    true fp32 passes).

    ``kind`` selects the in-register interpolation matrices: "linear"
    (2-band tent) or "cubic" (4-band Catmull-Rom — identical matmul
    cost in this dense formulation; the renderer's sharpness knob).
    """
    return _fwd_call(
        vol_cs, rs_par, z_rel, ch_par, nq=nq, dtype=dtype,
        interpret=interpret, kind=kind,
    )


def _sweep_fwd(vol_cs, rs_par, z_rel, ch_par, nq, dtype, interpret, kind):
    frames = _fwd_call(
        vol_cs, rs_par, z_rel, ch_par, nq=nq, dtype=dtype,
        interpret=interpret, kind=kind,
    )
    return frames, (vol_cs, rs_par, z_rel, ch_par, frames)


def _sweep_bwd(nq, dtype, interpret, kind, res, g):
    vol_cs, rs_par, z_rel, ch_par, frames = res
    dvol = _bwd_call(
        vol_cs, rs_par, z_rel, ch_par, frames, g, nq=nq, dtype=dtype,
        interpret=interpret, kind=kind,
    )
    return (
        dvol,
        jnp.zeros_like(rs_par),
        jnp.zeros_like(z_rel),
        jnp.zeros_like(ch_par),
    )


chunk_sweep.defvjp(_sweep_fwd, _sweep_bwd)
