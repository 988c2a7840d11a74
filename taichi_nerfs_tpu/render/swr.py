"""Shear-warp frustum renderer — the dense (gather-free) TPU path.

Renders a pinhole view of a dense feature grid by sweeping it slab-by-slab
along the dominant view axis (object-order shear-warp, perspective variant —
see docs/shear_warp.md).  Every operation is a dense slice, an affine
resample (one MXU matmul per axis, or a roll-select cascade for large
grids), a cumulative composite, or a batched MLP matmul; the single gather
in the pipeline is the final intermediate-frame -> pixel warp (one bilinear
gather per pixel).

Geometry
--------
Scene cube ``[-s, s]^3``, grid ``(R, R, R, F)`` with voxel centers at
``-s + (i + 0.5) * h`` (``h = 2s/R``).  For a camera at ``o`` with dominant
axis ``a``: slab ``k`` lives on the world plane ``z_k``; the ray through a
point ``p`` on that slab crosses any reference plane ``z_ref`` at
``q = o + (p - o) * rho`` with ``rho = (z_ref - o_a)/(z_k - o_a)`` — affine
per slab, hence two separable 1D affine resamples per slab.

The intermediate lattices are rectangular grids that *tightly cover the
view frustum's footprint* on each reference plane (origin/spacing are
traced functions of the camera, so one compiled program serves every pose
with the same static axis/flip): slabs composite front-to-back in per-chunk
frames, chunk frames fold into a global frame on the cube-center plane, and
one final projective bilinear warp lands on pixels.

Restrictions: the camera must be outside the cube along the dominant axis
(``|o_a| > s + margin``) — true for synthetic-NeRF/NSVF rigs.  The
general-camera path remains the sample renderer (``renderer.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import pyramid as pyr
from ..ops.sh import sh_encode
# Pallas VMEM budget for sweep-kernel dispatch (v5e/v5p have 128 MiB
# physical VMEM; the kernel requests 100 MiB scoped).  Module-level so
# tests can shrink it to force the per-chunk fallback at CPU sizes.
_PALLAS_VMEM_LIMIT = 88 * 2**20

from ..ops.warp import (
    resample_matmul,
    resample_matmul_batched,
    resample_matmul_windowed,
)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "img_wh",
        "axis",
        "flip",
        "n_chunks",
        "lat_pad",
        "white_bg",
        "debug_frames",
        "slab_window",
        "lat_size",
        "resample_dtype",
        "skip_empty",
        "warp",
        "want_distortion",
        "inside",
        "near",
        "sweep_impl",
        "early_exit",
        "resample_kind",
    ),
)
def render_swr_fixed_axis(
    params,
    grid: jnp.ndarray,
    cfg: pyr.PyramidConfig,
    pose: jnp.ndarray,  # (3, 4) camera-to-world
    K: jnp.ndarray,  # (3, 3) pinhole intrinsics
    img_wh: Tuple[int, int],
    axis: int,
    flip: bool,
    n_chunks: int = 16,
    lat_pad: int = 16,
    white_bg: bool = True,
    debug_frames: bool = False,
    slab_window: int = 0,
    lat_size: int = 0,
    resample_dtype: str = "float32",
    skip_empty: bool = False,
    warp: str = "matmul",
    want_distortion: bool = False,
    inside: bool = False,
    slope_bounds: jnp.ndarray | None = None,
    near: float = 0.0,
    sweep_impl: str = "auto",
    early_exit: float = 0.0,
    resample_kind: str = "linear",
) -> Dict[str, jnp.ndarray]:
    """Render with a statically chosen sweep axis/direction.

    Args:
        params: pyramid params (rgb MLP).
        grid: baked (R, R, R, F) grid, world-indexed [x, y, z].
        axis: static dominant world axis (0/1/2).
        flip: static — the camera sits on the +axis side (sweep descending).
        lat_pad: extra lattice cells beyond the pixel count (interpolation
            margin); the lattice is ``max(img_wh) + lat_pad`` square.
        slab_window: static source-window width for the per-slab resamples
            (see :func:`taichi_nerfs_tpu.ops.warp.resample_matmul_windowed`);
            0 = full matmul.  Must cover the widest slab footprint — use
            :func:`slab_window_bound`.
        lat_size: static override of the intermediate-lattice side.  The
            lattice only needs to resolve the *grid* (its information
            content is R cells across), so eval renders at high resolution
            cap it near ``R`` and let the final projective warp magnify.
            0 = ``max(img_wh) + lat_pad``.
        resample_dtype: matmul operand dtype for the slab resamples
            ("float32" or "bfloat16"; accumulation is fp32 either way).
        skip_empty: branch around the resample+shade of slabs whose max
            sigma is ~0 (``lax.cond`` executes one side on TPU) — the
            occupancy-grid analogue of the dense path.  Eval-only: under
            ``grad`` a skipped slab would get zero sigma gradient and
            could never become occupied.
        warp: final pixel warp — "matmul" (two-pass Catmull-Smith
            homography as batched band matmuls; gather-free, fast
            transpose; pass A solves for camera y), "matmul_x" (same,
            pass A solves for camera x — for poses/faces where the
            y-solve is singular; see ``pick_warp``), or "gather" (one
            packed bilinear gather — always well-posed, slower).
        want_distortion: also accumulate the Mip-NeRF-360 distortion loss
            per pixel (reference modules/distortion.py, DVGO running-sum
            form).  The carry already holds the prefix sums it needs
            (S_w = 1 - T, S_wt = depth numerator), and the cross-chunk
            pair terms close over the warped chunk sums at fold time, so
            the extra cost is one lattice map per frame.
        inside: cubemap-face mode for cameras *inside* the grid (real
            scenes).  This call renders the face ``(axis, sign)`` with
            ``sign = -1 if flip else +1``: only the pixels whose ray
            direction is dominated by that signed axis are valid (the
            caller merges faces per-pixel, :func:`render_swr_inside`).
            Differences from the outside sweep: frustum slope bounds are
            the static dominance bound (|d_b/d_a| <= 1), slabs on the
            camera's other side are masked out of the composite, and the
            global reference plane sits between the camera and the
            face's cube wall instead of at the cube center.
        sweep_impl: slab-sweep implementation.  "auto" uses the fused
            Pallas chunk kernel (:func:`taichi_nerfs_tpu.ops.swr_pallas.
            chunk_sweep`) on TPU whenever the call is in its scope
            (deferred shading, unsplit grid, outside camera, no
            distortion, full-matmul resample, no slab skip) and the XLA
            ``lax.scan`` otherwise; "xla" forces the scan; "pallas"
            forces the kernel (asserts scope); "pallas_interpret" runs
            the kernel in interpreter mode (CPU tests).
        early_exit: transmittance threshold for chunk-level early
            termination (eval-only, like the reference test path's
            ``T_threshold`` kill, modules/volume_render_test.py:23-49):
            when every pixel's remaining transmittance falls below it,
            the remaining (farther) chunks are never swept.  0 disables.
            The error of the dropped tail is bounded by the threshold.
            Unsupported (asserted) with distortion / debug frames — it
            is a no-grad rendering optimization.
    """
    assert early_exit == 0.0 or not (want_distortion or debug_frames), (
        "early_exit is eval-only: no distortion / debug frames"
    )
    # resample_kind="cubic": Catmull-Rom matrices in the slab + fold
    # resamples (ops/warp.py interp_kernel) — same matmul cost, much
    # less blur accumulated across the resample chain.  Full-matrix
    # path only; the windowed variant builds 2-band tents.  The Pallas
    # kernel builds either kind in-register (ops/swr_pallas.py _kern).
    assert resample_kind in ("linear", "cubic"), resample_kind
    assert resample_kind == "linear" or slab_window == 0, (
        "cubic resampling needs the full-matmul path (slab_window=0)"
    )
    s = cfg.scale
    R = cfg.grid_res
    F = cfg.features
    h = 2.0 * s / R
    w_img, h_img = img_wh
    nq = lat_size if lat_size else max(w_img, h_img) + lat_pad
    rs_dtype = jnp.dtype(resample_dtype)
    # split-resolution grid (cfg.sigma_res): sigma lives on a 2x finer
    # grid than the features; the sweep stays at feature granularity but
    # each feature slab composites its TWO sigma sub-slabs
    split = isinstance(grid, tuple)

    def slab_resample(x, start, step, axis_, window=slab_window):
        # operands in rs_dtype, fp32 accumulation, fp32 result
        x = x.astype(rs_dtype)
        if window:
            out = resample_matmul_windowed(
                x, start, step, nq, axis_, window
            )
        else:
            out = resample_matmul(
                x, start, step, nq, axis_, kind=resample_kind
            )
        return out.astype(jnp.float32)

    b_axis, c_axis = [d for d in range(3) if d != axis]
    zs = -s + (jnp.arange(R, dtype=jnp.float32) + 0.5) * h
    if split:
        sigma_g, feat_g = grid
        Rs = cfg.sigma_res
        h_s = 2.0 * s / Rs
        # vol: (D, F-1, Rb, Rc); vol_s: (D, 2, Rsb, Rsc) — sub-slab pairs
        vol = jnp.transpose(feat_g, (axis, 3, b_axis, c_axis))
        vol_s = jnp.transpose(sigma_g, (axis, b_axis, c_axis))
        zs_s = -s + (jnp.arange(Rs, dtype=jnp.float32) + 0.5) * h_s
        if flip:
            vol = vol[::-1]
            vol_s = vol_s[::-1]
            zs = zs[::-1]
            zs_s = zs_s[::-1]
        # after an optional flip, consecutive sub-slab pairs still belong
        # to one feature slab, in near-to-far order
        vol_s = vol_s.reshape(R, 2, Rs, Rs)
        zs_s2 = zs_s.reshape(R, 2)
    else:
        # vol: (D, F, Rb, Rc) — channel-leading minor block keeps
        # (sublane, lane) = (Rb, Rc) dense
        vol = jnp.transpose(grid, (axis, 3, b_axis, c_axis))
        if flip:
            vol = vol[::-1]
            zs = zs[::-1]

    o = pose[:, 3]
    o_a, o_b, o_c = o[axis], o[b_axis], o[c_axis]

    # frustum corner-ray slopes: q(z) = o_bc + (z - o_a) * slope
    cu = jnp.asarray([0.0, w_img - 1.0])
    cv = jnp.asarray([0.0, h_img - 1.0])
    uu, vv = jnp.meshgrid(cu, cv, indexing="xy")
    corner_cam = jnp.stack(
        [
            (uu - K[0, 2] + 0.5) / K[0, 0],
            (vv - K[1, 2] + 0.5) / K[1, 1],
            jnp.ones_like(uu),
        ],
        axis=-1,
    ).reshape(-1, 3)
    # (4, 3) world dirs.  HIGHEST: the slope bounds below divide by the
    # axis component — at default TPU matmul precision (bf16 passes) a
    # near-grazing corner rounds to 0 and the frame geometry blows up
    corner_w = jnp.matmul(
        corner_cam, pose[:, :3].T, precision=jax.lax.Precision.HIGHEST
    )
    if inside:
        sign_face = jnp.float32(-1.0 if flip else 1.0)
        # near margin along the sweep axis: at least the camera's own
        # slab; larger values (``near``, world units) suppress the
        # near-camera billboard failure mode — the first slabs' voxels
        # cover huge solid angles, so without a margin the optimizer
        # paints the view onto them instead of forming geometry
        margin = max(0.5 * h, near)

        def _safe(x, eps=1e-5):
            return jnp.where(
                x >= 0, jnp.maximum(x, eps), jnp.minimum(x, -eps)
            )

        # slope bounds: when every corner's d_axis has the face's sign,
        # d_axis (affine in pixel coords) is sign-constant over the whole
        # view, each slope d_b/d_a is a Mobius function with nonvanishing
        # denominator — monotone along every line, so the 4 corner values
        # bound it (clipped to the dominance cone |slope| <= 1: face
        # pixels can never exceed it, so clipping only tightens the
        # frame).  Otherwise (face boundary crosses the view) fall back
        # to the full cone.  A cone-wide lattice blurs narrow crops
        # (measured: a 256-crop resolved by ~40 lattice cells), hence the
        # traced tight path for training crops
        if slope_bounds is not None:
            # caller-supplied tight bounds (render_swr_inside computes
            # them per face from the actual pixel dirs)
            sb_lo, sb_hi = slope_bounds[0, 0], slope_bounds[0, 1]
            sc_lo, sc_hi = slope_bounds[1, 0], slope_bounds[1, 1]
        else:
            d_a_c = corner_w[:, axis]
            one_face = jnp.all(sign_face * d_a_c > 1e-6)
            sb_c = jnp.clip(
                corner_w[:, b_axis] / _safe(d_a_c), -1.05, 1.05
            )
            sc_c = jnp.clip(
                corner_w[:, c_axis] / _safe(d_a_c), -1.05, 1.05
            )
            sb_lo = jnp.where(one_face, jnp.min(sb_c), -1.05)
            sb_hi = jnp.where(one_face, jnp.max(sb_c), 1.05)
            sc_lo = jnp.where(one_face, jnp.min(sc_c), -1.05)
            sc_hi = jnp.where(one_face, jnp.max(sc_c), 1.05)
    else:
        # division guard ONLY — large slopes are legitimate geometry
        # (wide-fov views with a barely-dominant axis need frames many
        # cube-widths wide to cover their corner rays; clipping the
        # slopes shrinks the frame and silently blacks out everything
        # outside it).  The guard exists purely so a corner component
        # that is *exactly* 0 (possible on TPU before the HIGHEST-
        # precision corner matmul above, measure-zero after) cannot
        # produce inf/NaN frame geometry.
        d_a_c = corner_w[:, axis]
        d_a_c = jnp.where(
            jnp.abs(d_a_c) < 1e-12,
            jnp.where(d_a_c >= 0, 1e-12, -1e-12),
            d_a_c,
        )
        slope_b = corner_w[:, b_axis] / d_a_c
        slope_c = corner_w[:, c_axis] / d_a_c
        sb_lo, sb_hi = jnp.min(slope_b), jnp.max(slope_b)
        sc_lo, sc_hi = jnp.min(slope_c), jnp.max(slope_c)

        def _safe(x):
            return x

    def frame_at(z_ref):
        """Lattice origin/spacing covering the frustum at plane z_ref.

        Outside cameras additionally intersect the frustum footprint
        with the *cube's central-projection shadow* on the plane: slab
        content lives in [-s, s]^2, so rays carrying any of it cross
        z_ref inside the projection of the (voxel-expanded) cube from
        the camera — bounded by the 4 extreme corner projections per
        lateral axis.  For wide-fov views whose sweep axis is barely
        dominant (slope spans of +-100s; the round-4 "view 22" class),
        the frustum frame is ~30x wider than the shadow and the grid
        collapsed onto a handful of lattice cells (17 dB view); the
        intersection restores full lattice resolution at zero cost.
        """
        za = z_ref - o_a
        # za's sign decides which slope end is the minimum
        b0 = o_b + za * jnp.where(za >= 0, sb_lo, sb_hi)
        b1 = o_b + za * jnp.where(za >= 0, sb_hi, sb_lo)
        c0 = o_c + za * jnp.where(za >= 0, sc_lo, sc_hi)
        c1 = o_c + za * jnp.where(za >= 0, sc_hi, sc_lo)
        if not inside:
            # cube expanded by 2h: trilinear support + frame margin
            sE = s + 2.0 * h

            def _nz(x):
                return jnp.where(
                    jnp.abs(x) < 1e-6,
                    jnp.where(x >= 0, 1e-6, -1e-6),
                    x,
                )

            r_hi = za / _nz(sE - o_a)
            r_lo = za / _nz(-sE - o_a)
            qb = jnp.stack(
                [
                    o_b + (sE - o_b) * r_hi,
                    o_b + (sE - o_b) * r_lo,
                    o_b + (-sE - o_b) * r_hi,
                    o_b + (-sE - o_b) * r_lo,
                ]
            )
            qc = jnp.stack(
                [
                    o_c + (sE - o_c) * r_hi,
                    o_c + (sE - o_c) * r_lo,
                    o_c + (-sE - o_c) * r_hi,
                    o_c + (-sE - o_c) * r_lo,
                ]
            )
            # the corner-slope frustum interval is only valid when the
            # sweep-axis direction component is sign-constant over the
            # view (d_a is affine in pixel coords, so the 4 corners
            # decide exactly); when d_a crosses zero in-view the slopes
            # wrap through infinity and [min, max] of the corners is
            # meaningless — the bounded, always-correct frame is the
            # shadow alone
            d_ac = corner_w[:, axis]
            frustum_ok = (jnp.min(d_ac) > 0) | (jnp.max(d_ac) < 0)
            # axis-0 reductions: frame_at is also called with a VECTOR
            # z_ref (the Pallas caller batches all chunks through one
            # call), so the corner reduction must stay per-chunk
            qb_lo, qb_hi = jnp.min(qb, axis=0), jnp.max(qb, axis=0)
            qc_lo, qc_hi = jnp.min(qc, axis=0), jnp.max(qc, axis=0)
            nb0 = jnp.where(frustum_ok, jnp.maximum(b0, qb_lo), qb_lo)
            nb1 = jnp.where(frustum_ok, jnp.minimum(b1, qb_hi), qb_hi)
            nc0 = jnp.where(frustum_ok, jnp.maximum(c0, qc_lo), qc_lo)
            nc1 = jnp.where(frustum_ok, jnp.minimum(c1, qc_hi), qc_hi)
            # empty intersection = view misses the cube laterally; any
            # non-degenerate frame renders the (empty) content correctly
            b0 = nb0
            b1 = jnp.maximum(nb1, nb0 + 1e-5)
            c0 = nc0
            c1 = jnp.maximum(nc1, nc0 + 1e-5)
        db = (b1 - b0) / (nq - 1 - lat_pad)
        dc = (c1 - c0) / (nq - 1 - lat_pad)
        # center the margin
        return (
            b0 - db * (lat_pad // 2),
            db,
            c0 - dc * (lat_pad // 2),
            dc,
        )

    dc_slabs = R // n_chunks
    zs_c = zs.reshape(n_chunks, dc_slabs)
    # per-slab occupancy (max sigma): drives the eval-time slab skip
    if split:
        nF = F - 1
        vol_c = vol.reshape(n_chunks, dc_slabs, nF, R, R)
        vol_s_c = vol_s.reshape(n_chunks, dc_slabs, 2, Rs, Rs)
        zs_s_c = zs_s2.reshape(n_chunks, dc_slabs, 2)
        occ_c = jnp.max(vol_s, axis=(1, 2, 3)).reshape(
            n_chunks, dc_slabs
        )
    else:
        vol_c = vol.reshape(n_chunks, dc_slabs, F, R, R)
        occ_c = jnp.max(vol[:, 0], axis=(1, 2)).reshape(
            n_chunks, dc_slabs
        )

    # global frame: the cube-center plane outside; between the camera and
    # the face's cube wall inside (the center plane can sit behind an
    # inside camera)
    if inside:
        z_g = 0.5 * (jnp.clip(o_a, -s, s) + sign_face * s)
    else:
        z_g = jnp.float32(0.0)
    g_b0, g_db, g_c0, g_dc = frame_at(z_g)

    lat_i = jnp.arange(nq, dtype=jnp.float32)
    # deferred shading composites the (F-1) feature channels instead of rgb
    acc_ch = (F - 1) if cfg.deferred else 3

    # the sigma sub-slab resample step is 2x the feature step in index
    # units (h_s = h/2), so its static source window doubles
    sigma_window = 2 * slab_window if (split and slab_window) else 0

    def chunk_body(carry, inp):
        if want_distortion:
            acc_g, depth_g, t_g, dist_g = carry
        else:
            acc_g, depth_g, t_g = carry
        z_slabs = inp["z"]
        if inside:
            # reference the chunk frame on its *valid* (camera-side)
            # slabs; fully invalid chunks (all masked) park it on the
            # face's cube wall so every division stays finite
            v_ch = (sign_face * (z_slabs - o_a) > margin).astype(
                jnp.float32
            )
            z_ref = jnp.where(
                jnp.sum(v_ch) > 0,
                jnp.sum(z_slabs * v_ch) / jnp.maximum(jnp.sum(v_ch), 1.0),
                o_a + sign_face * s,
            )
        else:
            z_ref = jnp.mean(z_slabs)
        f_b0, f_db, f_c0, f_dc = frame_at(z_ref)
        qb = f_b0 + lat_i * f_db  # (nq,) world b coords on this frame
        qc = f_c0 + lat_i * f_dc

        # rays through the chunk lattice: P = (z_ref at axis, qb, qc)
        vb = qb[:, None] - o_b  # (nq, 1)
        vc = qc[None, :] - o_c  # (1, nq)
        va = z_ref - o_a
        norm = jnp.sqrt(va * va + vb * vb + vc * vc)  # (nq, nq)
        inv_da = norm / jnp.abs(va)
        dt = h * inv_da  # per-lattice step length along the ray
        if cfg.deferred:
            d_enc = None
        else:
            # world-order unit direction, SH-encoded once per chunk (the
            # per-slab shading below reuses it)
            comps = [None, None, None]
            comps[axis] = jnp.broadcast_to(va / norm, (nq, nq))
            comps[b_axis] = jnp.broadcast_to(vb / norm, (nq, nq))
            comps[c_axis] = jnp.broadcast_to(vc / norm, (nq, nq))
            dirs = jnp.stack(comps, axis=-1)  # (nq, nq, 3)
            d_enc = sh_encode((dirs + 1.0) / 2.0)

        def resample_to_lattice(x, z_k, h_src, window):
            # source index of lattice i: m(i) = (p_b + s)/h_src - 1/2
            # with p_b = o_b + (q_i - o_b)/rho
            rho = _safe((z_ref - o_a) / _safe(z_k - o_a))
            start_b = (o_b + (qb[0] - o_b) / rho + s) / h_src - 0.5
            start_c = (o_c + (qc[0] - o_c) / rho + s) / h_src - 0.5
            step_b = f_db / (rho * h_src)
            step_c = f_dc / (rho * h_src)
            sq = slab_resample(x, start_b, step_b, 1, window)
            return slab_resample(sq, start_c, step_c, 2, window)

        def slab_work(carry_s, inp_s):
            if want_distortion:
                acc, depth_acc, t_acc, dist_acc = carry_s
            else:
                acc, depth_acc, t_acc = carry_s
            if split:
                # features at slab granularity; alpha from the two sigma
                # sub-slabs (each with its own affine map)
                fq = resample_to_lattice(
                    inp_s["f"], inp_s["z"], h, slab_window
                )
                feats = jnp.moveaxis(fq, 0, -1)  # (nq, nq, F-1)
                z_s = inp_s["zs"]
                if sigma_window:
                    s0 = resample_to_lattice(
                        inp_s["s"][0:1], z_s[0], h_s, sigma_window
                    )[0]
                    s1 = resample_to_lattice(
                        inp_s["s"][1:2], z_s[1], h_s, sigma_window
                    )[0]
                else:
                    # both sub-slabs in one batched matmul (each world
                    # plane has its own affine map)
                    rho = _safe((z_ref - o_a) / _safe(z_s - o_a))  # (2,)
                    sb = (o_b + (qb[0] - o_b) / rho + s) / h_s - 0.5
                    sc = (o_c + (qc[0] - o_c) / rho + s) / h_s - 0.5
                    stb = f_db / (rho * h_s)
                    stc = f_dc / (rho * h_s)
                    sp = inp_s["s"].astype(rs_dtype)  # (2, Rs, Rs)
                    sp = resample_matmul_batched(
                        sp, sb, stb, nq, 1, kind=resample_kind
                    )
                    sp = resample_matmul_batched(
                        sp, sc, stc, nq, 2, kind=resample_kind
                    )
                    sp = sp.astype(jnp.float32)
                    s0, s1 = sp[0], sp[1]
                dt_s = 0.5 * dt
                a0 = 1.0 - jnp.exp(-jnp.maximum(s0, 0.0) * dt_s)
                a1 = 1.0 - jnp.exp(-jnp.maximum(s1, 0.0) * dt_s)
                if inside:
                    a0 = a0 * (sign_face * (z_s[0] - o_a) > margin)
                    a1 = a1 * (sign_face * (z_s[1] - o_a) > margin)
                w0 = a0 * t_acc
                w1 = a1 * t_acc * (1.0 - a0)
                w = w0 + w1
                sgn = jnp.sign(va)
                t0r = (z_s[0] - o_a) * inv_da * sgn
                t1r = (z_s[1] - o_a) * inv_da * sgn
                depth_contrib = w0 * t0r + w1 * t1r
                t_next = t_acc * (1.0 - a0) * (1.0 - a1)
                if want_distortion:
                    s_w = 1.0 - t_acc
                    s_wt = depth_acc
                    dcon = (
                        2.0 * w0 * (t0r * s_w - s_wt)
                        + w0 * w0 * dt_s / 3.0
                    )
                    s_w = s_w + w0
                    s_wt = s_wt + w0 * t0r
                    dcon = dcon + (
                        2.0 * w1 * (t1r * s_w - s_wt)
                        + w1 * w1 * dt_s / 3.0
                    )
            else:
                sq = resample_to_lattice(
                    inp_s["f"], inp_s["z"], h, slab_window
                )
                slab_q = jnp.moveaxis(sq, 0, -1)  # (nq, nq, F)
                sigma = pyr.density_from_grid(slab_q)
                feats = slab_q[..., 1:]  # (nq, nq, F-1)
                alpha = 1.0 - jnp.exp(-sigma * dt)
                if inside:
                    # slabs behind (or at) the camera never composite
                    alpha = alpha * (
                        sign_face * (inp_s["z"] - o_a) > margin
                    )
                w = alpha * t_acc
                t_ray = (inp_s["z"] - o_a) * inv_da * jnp.sign(va)
                depth_contrib = w * t_ray
                t_next = t_acc * (1.0 - alpha)
                if want_distortion:
                    dcon = (
                        2.0 * w * (t_ray * (1.0 - t_acc) - depth_acc)
                        + w * w * dt / 3.0
                    )
            if cfg.deferred:
                contrib = feats
            else:
                contrib = pyr.rgb_from_features_enc(
                    params, cfg, feats, d_enc
                )
            acc = acc + w[..., None] * contrib
            depth_acc = depth_acc + depth_contrib
            if want_distortion:
                return (acc, depth_acc, t_next, dist_acc + dcon)
            return (acc, depth_acc, t_next)

        def slab_body(carry_s, inp_s):
            if skip_empty:
                carry_s = jax.lax.cond(
                    inp_s["occ"] > 1e-4,
                    lambda c: slab_work(c, inp_s),
                    lambda c: c,
                    carry_s,
                )
            else:
                carry_s = slab_work(carry_s, inp_s)
            return carry_s, None

        init = (
            jnp.zeros((nq, nq, acc_ch), jnp.float32),
            jnp.zeros((nq, nq), jnp.float32),
            jnp.ones((nq, nq), jnp.float32),
        )
        if want_distortion:
            init = init + (jnp.zeros((nq, nq), jnp.float32),)
        # remat: without it the backward stores every slab's resampled
        # frame + MLP activations (~85 GB at R=256); recomputing them per
        # slab keeps the live set at the carry size
        if want_distortion:
            (acc_c, depth_c, t_c, dist_c), _ = jax.lax.scan(
                jax.checkpoint(slab_body), init, inp
            )
        else:
            (acc_c, depth_c, t_c), _ = jax.lax.scan(
                jax.checkpoint(slab_body), init, inp
            )

        # fold this chunk's frame into the global frame: the ray at global
        # lattice q_g crosses the chunk plane at q_c = o + (q_g - o)*rho_cg
        rho_cg = (z_ref - o_a) / _safe(z_g - o_a)
        start_b = (o_b * (1 - rho_cg) + g_b0 * rho_cg - f_b0) / f_db
        step_b = g_db * rho_cg / f_db
        start_c = (o_c * (1 - rho_cg) + g_c0 * rho_cg - f_c0) / f_dc
        step_c = g_dc * rho_cg / f_dc
        chans = [
            jnp.moveaxis(acc_c, -1, 0),
            depth_c[None],
            (1.0 - t_c)[None],
        ]
        if want_distortion:
            chans.append(dist_c[None])
        packed = jnp.concatenate(chans, axis=0)  # (acc_ch + 2 [+1], nq, nq)
        packed = resample_matmul(
            packed, start_b, step_b, nq, axis=1, kind=resample_kind
        )
        packed = resample_matmul(
            packed, start_c, step_c, nq, axis=2, kind=resample_kind
        )
        acc_w = jnp.moveaxis(packed[:acc_ch], 0, -1)
        depth_w = packed[acc_ch]
        # chunk-local accumulated weight; Catmull-Rom's negative lobes
        # can overshoot the resampled opacity outside [0, 1] at hard
        # silhouettes, which would compound into a signed/overshooting
        # global transmittance across chunks — clamp (no-op for linear)
        op_w = jnp.clip(packed[acc_ch + 1], 0.0, 1.0)
        t_w = 1.0 - op_w
        if want_distortion:
            # chunk-local pair terms scale by t_g^2 (global weight of a
            # chunk sample is t_g * w); cross-chunk pairs close over the
            # global prefix sums (S_W = 1 - t_g, S_Wt = depth_g)
            dist_g = (
                dist_g
                + t_g * t_g * packed[acc_ch + 2]
                + 2.0
                * t_g
                * ((1.0 - t_g) * depth_w - depth_g * op_w)
            )
        acc_g = acc_g + t_g[..., None] * acc_w
        depth_g = depth_g + t_g * depth_w
        t_g = t_g * t_w
        dbg = (acc_c, t_c, packed) if debug_frames else None
        if want_distortion:
            return (acc_g, depth_g, t_g, dist_g), dbg
        return (acc_g, depth_g, t_g), dbg

    init_g = (
        jnp.zeros((nq, nq, acc_ch), jnp.float32),
        jnp.zeros((nq, nq), jnp.float32),
        jnp.ones((nq, nq), jnp.float32),
    )
    if want_distortion:
        init_g = init_g + (jnp.zeros((nq, nq), jnp.float32),)
    xs = {"f": vol_c, "z": zs_c, "occ": occ_c}
    if split:
        xs["s"] = vol_s_c
        xs["zs"] = zs_s_c

    # slab-sweep dispatch: the fused Pallas chunk kernel covers the
    # flagship train/bench configuration (ops/swr_pallas.py docstring);
    # everything else runs the XLA scan
    # skip_empty does NOT block the Pallas path: the kernel composites
    # every slab (sigma <= 1e-4 slabs contribute alpha <= ~1e-6), which
    # is strictly more exact than the scan's lax.cond skip — and the
    # fused sweep at eval sizes is far faster than scan-with-skips.
    # VMEM guard: the kernel parks the (F+2, nq, nq) frame + 4 (nq, nq)
    # scratch buffers + double-buffered slab blocks in VMEM.
    # VMEM budgets, calibrated on v5e: the multi-chunk (batched-grid)
    # call double-buffers the (F+2, nq, nq) frame block across the
    # chunk grid dim — measured 115.6M at F=16, nq=816 (the old 56M
    # estimate OOMed the compiler there); a single-chunk dispatch holds
    # ONE frame block and measured-fits at the same size.  Per-chunk
    # dispatch is therefore the only Pallas mode for uncapped-800^2
    # lattices at F=16 — and the early-exit loop already uses it.
    _scratch = 4 * nq * nq * 4 + 2 * (acc_ch + 1) * cfg.grid_res**2 * 4
    vmem_batched = 2 * (acc_ch + 3) * nq * nq * 4 + _scratch
    vmem_chunked = (acc_ch + 3) * nq * nq * 4 + _scratch
    pallas_scope = (
        cfg.deferred
        and not split
        and not inside
        and not want_distortion
        and not debug_frames
        and slab_window == 0
        and vmem_chunked <= _PALLAS_VMEM_LIMIT
    )
    pallas_batched_ok = vmem_batched <= _PALLAS_VMEM_LIMIT
    if sweep_impl == "auto":
        use_pallas = pallas_scope and jax.default_backend() == "tpu"
        pallas_interp = False
    elif sweep_impl in ("pallas", "pallas_interpret"):
        assert pallas_scope, (
            "sweep_impl=pallas requires deferred shading, an unsplit "
            "grid, an outside camera, no distortion, slab_window=0 and "
            "a lattice that fits VMEM (~1100^2 at F=8)"
        )
        assert sweep_impl != "pallas" or jax.default_backend() == "tpu", (
            "sweep_impl='pallas' needs a TPU backend (Mosaic lowering); "
            "use sweep_impl='pallas_interpret' on CPU/GPU"
        )
        use_pallas = True
        pallas_interp = sweep_impl == "pallas_interpret"
    else:
        assert sweep_impl == "xla", f"unknown sweep_impl {sweep_impl!r}"
        use_pallas = False

    if use_pallas:
        from ..ops.swr_pallas import chunk_sweep

        # per-chunk reference planes + lattice frames, vectorized over
        # chunks (same math as chunk_body's scalar path)
        z_ref_c = jnp.mean(zs_c, axis=1)  # (n_chunks,)
        fb0_c, fdb_c, fc0_c, fdc_c = frame_at(z_ref_c)
        # per-slab resample params (resample_to_lattice's start/step)
        rho = (z_ref_c[:, None] - o_a) / (zs_c - o_a)  # (n_chunks, dc)
        rs_par = jnp.stack(
            [
                (o_b + (fb0_c[:, None] - o_b) / rho + s) / h - 0.5,
                fdb_c[:, None] / (rho * h),
                (o_c + (fc0_c[:, None] - o_c) / rho + s) / h - 0.5,
                fdc_c[:, None] / (rho * h),
            ],
            axis=-1,
        )  # (n_chunks, dc, 4)
        z_rel = zs_c - o_a
        ch_par = jnp.stack(
            [
                fb0_c - o_b,
                fdb_c,
                fc0_c - o_c,
                fdc_c,
                z_ref_c - o_a,
                jnp.full_like(z_ref_c, h),
            ],
            axis=-1,
        )  # (n_chunks, 6)
        def fold_body(carry, inp):
            acc_g, depth_g, t_g = carry
            packed = inp["fr"][: acc_ch + 2]
            z_ref = inp["z"]
            f_b0, f_db, f_c0, f_dc = inp["fb"]
            rho_cg = (z_ref - o_a) / _safe(z_g - o_a)
            start_b = (o_b * (1 - rho_cg) + g_b0 * rho_cg - f_b0) / f_db
            step_b = g_db * rho_cg / f_db
            start_c = (o_c * (1 - rho_cg) + g_c0 * rho_cg - f_c0) / f_dc
            step_c = g_dc * rho_cg / f_dc
            packed = resample_matmul(
                packed, start_b, step_b, nq, axis=1, kind=resample_kind
            )
            packed = resample_matmul(
                packed, start_c, step_c, nq, axis=2, kind=resample_kind
            )
            acc_g = acc_g + t_g[..., None] * jnp.moveaxis(
                packed[:acc_ch], 0, -1
            )
            depth_g = depth_g + t_g * packed[acc_ch]
            # clamp cubic opacity overshoot (see chunk_body's fold)
            t_g = t_g * (1.0 - jnp.clip(packed[acc_ch + 1], 0.0, 1.0))
            return (acc_g, depth_g, t_g), None

        if early_exit > 0.0:
            # chunk-level early termination: sweep one chunk at a time
            # (front-to-back) and stop once every pixel is saturated —
            # the farther chunks are never swept at all.  The fused
            # kernel makes per-chunk dispatch cheap; a converged opaque
            # scene typically saturates after the surface chunk, saving
            # the back half of the grid.
            #
            # Occupancy gating: on white-background object scenes the
            # background pixels never saturate, so the transmittance
            # stop alone never fires and every chunk gets swept one
            # kernel at a time (slower than the batched sweep).  Two
            # additions make the loop win regardless: (a) empty chunks
            # (max sigma <= 1e-4, the scan path's skip_empty threshold)
            # skip their sweep+fold entirely via lax.cond, and (b) the
            # loop stops outright once no *remaining* chunk is occupied
            # — the per-slab error bound of a skipped chunk is
            # alpha <= 1e-4 * dt, the same bound skip_empty accepts.
            occ_chunk = jnp.max(occ_c, axis=1) > 1e-4  # (n_chunks,)
            # rem_occ[g] = any occupied chunk at index >= g
            rem_occ = jnp.concatenate(
                [
                    jnp.cumsum(occ_chunk[::-1].astype(jnp.int32))[::-1]
                    > 0,
                    jnp.zeros((1,), bool),
                ]
            )

            def ee_cond(c):
                g = c[0]
                t_g = c[3]
                return (
                    (g < n_chunks)
                    & (jnp.max(t_g) > early_exit)
                    & rem_occ[g]
                )

            def ee_body(c):
                g, acc_g, depth_g, t_g = c

                def sweep(carry):
                    acc_g, depth_g, t_g = carry

                    def sl(x):
                        return jax.lax.dynamic_slice_in_dim(
                            x, g, 1, axis=0
                        )

                    fr = chunk_sweep(
                        sl(vol_c), sl(rs_par), sl(z_rel), sl(ch_par),
                        nq, rs_dtype, pallas_interp, resample_kind,
                    )[0]
                    idx = lambda x: jax.lax.dynamic_index_in_dim(  # noqa: E731
                        x, g, axis=0, keepdims=False
                    )
                    (acc_g, depth_g, t_g), _ = fold_body(
                        (acc_g, depth_g, t_g),
                        {
                            "fr": fr,
                            "z": idx(z_ref_c),
                            "fb": (
                                idx(fb0_c), idx(fdb_c),
                                idx(fc0_c), idx(fdc_c),
                            ),
                        },
                    )
                    return (acc_g, depth_g, t_g)

                acc_g, depth_g, t_g = jax.lax.cond(
                    occ_chunk[g], sweep, lambda c: c,
                    (acc_g, depth_g, t_g),
                )
                return (g + 1, acc_g, depth_g, t_g)

            _, acc_g, depth_g, t_g = jax.lax.while_loop(
                ee_cond, ee_body, (jnp.int32(0),) + init_g
            )
        elif not pallas_batched_ok:
            # big-lattice fallback: one kernel launch per chunk inside a
            # scan (single frame block resident — fits where the batched
            # grid OOMs); differentiable, so the train path can land
            # here too at extreme crop sizes
            def pc_body(carry, x):
                fr = chunk_sweep(
                    x["vol"][None], x["rs"][None], x["zr"][None],
                    x["ch"][None], nq, rs_dtype, pallas_interp,
                    resample_kind,
                )[0]
                return fold_body(
                    carry, {"fr": fr, "z": x["z"], "fb": x["fb"]}
                )

            (acc_g, depth_g, t_g), _ = jax.lax.scan(
                pc_body,
                init_g,
                {
                    "vol": vol_c,
                    "rs": rs_par,
                    "zr": z_rel,
                    "ch": ch_par,
                    "z": z_ref_c,
                    "fb": (fb0_c, fdb_c, fc0_c, fdc_c),
                },
            )
        else:
            frames = chunk_sweep(
                vol_c, rs_par, z_rel, ch_par, nq, rs_dtype,
                pallas_interp, resample_kind,
            )  # (n_chunks, F+2, nq, nq)
            (acc_g, depth_g, t_g), _ = jax.lax.scan(
                fold_body,
                init_g,
                {
                    "fr": frames,
                    "z": z_ref_c,
                    "fb": (fb0_c, fdb_c, fc0_c, fdc_c),
                },
            )
        chunk_dbg = None
    # no outer remat: the slab scan inside is already checkpointed, so the
    # per-chunk residuals are just the (nq, nq) frame images — cheap to
    # store, and re-running the whole slab sweep in backward would double
    # the heavy work
    elif want_distortion:
        (acc_g, depth_g, t_g, dist_g), chunk_dbg = jax.lax.scan(
            chunk_body, init_g, xs
        )
    elif early_exit > 0.0:
        # chunk-level early termination on the scan path (see the Pallas
        # branch above): stop sweeping once every pixel is saturated
        def ee_cond(c):
            g = c[0]
            t_g = c[3]
            return (g < n_chunks) & (jnp.max(t_g) > early_exit)

        def ee_body(c):
            g = c[0]
            inp_g = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, g, axis=0, keepdims=False
                ),
                xs,
            )
            carry, _ = chunk_body(c[1:], inp_g)
            return (g + 1,) + carry

        c = jax.lax.while_loop(
            ee_cond, ee_body, (jnp.int32(0),) + init_g
        )
        acc_g, depth_g, t_g = c[1:]
        chunk_dbg = None
    else:
        (acc_g, depth_g, t_g), chunk_dbg = jax.lax.scan(
            chunk_body, init_g, xs
        )

    # final projective warp: pixel -> global-frame lattice coords
    u = jnp.arange(w_img, dtype=jnp.float32)
    v = jnp.arange(h_img, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    dir_cam = jnp.stack(
        [
            (uu - K[0, 2] + 0.5) / K[0, 0],
            (vv - K[1, 2] + 0.5) / K[1, 1],
            jnp.ones_like(uu),
        ],
        axis=-1,
    )  # (h, w, 3)
    # HIGHEST: the default TPU f32 matmul runs bf16 passes; with ~8 bits
    # of mantissa a near-grazing pixel's axis component rounds to 0 (or
    # flips sign), and the division below turns one eval view into NaNs
    # (finite on CPU — the round-3 open bug).  This 3x3 contraction is
    # free at full precision.
    dir_w = jnp.einsum(
        "ij,hwj->hwi",
        pose[:, :3],
        dir_cam,
        precision=jax.lax.Precision.HIGHEST,
    )
    da = dir_w[..., axis]
    # grazing rays (|da| ~ 0) cross the slab stack near-parallel — the
    # sweep cannot represent them; guard the division (sign-preserving)
    # and fold them into the invalid mask instead of letting inf * 0
    # produce NaN lattice coords
    grazing = jnp.abs(da) < 1e-6
    da_safe = jnp.where(grazing, jnp.where(da >= 0, 1e-6, -1e-6), da)
    t_hit = (z_g - o_a) / da_safe
    pb = o_b + t_hit * dir_w[..., b_axis]
    pc = o_c + t_hit * dir_w[..., c_axis]
    # valid pixels land inside the global frame by construction; clipping
    # only tames the guarded-grazing ones before the int32 cast
    li = jnp.clip((pb - g_b0) / g_db, -1.0, float(nq))
    lj = jnp.clip((pc - g_c0) / g_dc, -1.0, float(nq))
    behind = (t_hit <= 0.0) | grazing

    img_ch = [acc_g, depth_g[..., None], (1.0 - t_g)[..., None]]
    if want_distortion:
        img_ch.append(dist_g[..., None])
    img = jnp.concatenate(img_ch, axis=-1)  # (nq, nq, acc_ch + 2 [+1])

    if warp == "gather":
        # one bilinear gather: pack the 2x2 neighbourhood into one wide
        # row (cheap dense rolls) so the tap is ONE gather of H*W rows
        i0 = jnp.clip(jnp.floor(li).astype(jnp.int32), 0, nq - 2)
        j0 = jnp.clip(jnp.floor(lj).astype(jnp.int32), 0, nq - 2)
        fi = jnp.clip(li - i0, 0.0, 1.0)
        fj = jnp.clip(lj - j0, 0.0, 1.0)
        nch = img.shape[-1]
        sh_j = jnp.roll(img, -1, axis=1)
        img4 = jnp.concatenate([img, sh_j], axis=-1)  # [p, p+j]
        img4 = jnp.concatenate(
            [img4, jnp.roll(img4, -1, axis=0)], axis=-1
        )  # [p, p+j, p+i, p+ij]  (nq, nq, 4*nch)
        # flat-index take, NOT img4[i0, j0]: the 2-D advanced-index
        # gather of this rolled/concatenated array miscompiles on TPU
        # when fused with the blend below — a deterministic 32-element
        # -inf leak (XLA fill-lane value) that rendered one eval view
        # NaN per rig on the lego-proxy.  Minimal repro + bisection in
        # docs/status_r4.md; the linear-index formulation lowers to a
        # 1-D gather and is clean in the same fusion context.
        g = jnp.take(
            img4.reshape(nq * nq, 4 * nch), i0 * nq + j0, axis=0
        )  # (h, w, 4*nch)
        g00 = g[..., :nch]
        g01 = g[..., nch : 2 * nch]
        g10 = g[..., 2 * nch : 3 * nch]
        g11 = g[..., 3 * nch :]
        pix = (
            g00 * ((1 - fi) * (1 - fj))[..., None]
            + g01 * ((1 - fi) * fj)[..., None]
            + g10 * (fi * (1 - fj))[..., None]
            + g11 * (fi * fj)[..., None]
        )
    else:
        # two-pass matmul warp (Catmull-Smith): the homography pixel ->
        # lattice factors into two batched 1-D *rational* resamples, each
        # one MXU matmul against an on-the-fly 2-band hat matrix — no
        # gather at all, and the autodiff transpose is two matmuls too.
        #
        # Geometry: with x = x(u), y = y(v) the camera-plane coords,
        # d = r0*x + r1*y + r2 (world), the lattice coords are
        #   li = ((o_b - g_b0)*da - o_a*db) / (g_db * da)
        #   lj = ((o_c - g_c0)*dc_den) ... (same shape in c)
        # Pass A parametrizes each lattice row j (the line lj = j in the
        # camera plane) by ONE pixel coordinate and solves for the other:
        # warp="matmul" fixes x (per output column) and solves for y;
        # "matmul_x" fixes y (per output row) and solves for x.  The
        # solve denominator is proportional to (rc[s] - slope_c*ra[s]);
        # a zero inside the lattice's slope_c range sends the solution
        # to infinity and the rows near it compose garbage (measured: an
        # opacity-0 streak on a rolled cubemap sliver face).  The host
        # picks the well-conditioned coordinate per compiled program
        # (``pick_warp`` / ``_matmul_solve_choice``); pass B then
        # resamples inter along j at lj(u, v).
        r = pose[:, :3]  # world = r @ cam
        ra = r[axis]
        rb = r[b_axis]
        rc = r[c_axis]
        xs_pix = (
            jnp.arange(w_img, dtype=jnp.float32) - K[0, 2] + 0.5
        ) / K[0, 0]
        ys_pix = (
            jnp.arange(h_img, dtype=jnp.float32) - K[1, 2] + 0.5
        ) / K[1, 1]
        j_ar = jnp.arange(nq, dtype=jnp.float32)
        # gamma_j (o_c - g_c0 - j*g_dc): solve
        #   gamma_j * da(x, y) = (o_a - z_g) * dc(x, y)
        # for the non-free coordinate (the global lattice plane sits at
        # z_g; z_g = 0 outside)
        oa_rel = o_a - z_g
        gam = o_c - g_c0 - j_ar * g_dc  # (J,)
        if warp == "matmul_x":
            fidx, sidx = 1, 0  # free coord y (one solve per row v)
            free = ys_pix
        else:
            fidx, sidx = 0, 1  # free coord x (one solve per column u)
            free = xs_pix
        num = (oa_rel * rc[fidx] - gam[:, None] * ra[fidx]) * free[
            None, :
        ] + (oa_rel * rc[2] - gam[:, None] * ra[2])  # (J, N)
        den = (
            gam[:, None] * ra[sidx] - oa_rel * rc[sidx]
            + jnp.zeros_like(num)
        )
        sol = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        if warp == "matmul_x":
            x_p, y_p = sol, free[None, :] + jnp.zeros_like(sol)
        else:
            x_p, y_p = free[None, :] + jnp.zeros_like(sol), sol
        da_j = ra[0] * x_p + ra[1] * y_p + ra[2]  # (J, N)
        db_j = rb[0] * x_p + rb[1] * y_p + rb[2]
        posA = ((o_b - g_b0) * da_j - oa_rel * db_j) / (
            g_db * jnp.where(jnp.abs(da_j) < 1e-12, 1e-12, da_j)
        )  # (J, N): source-i position for (row j, out line n)
        posA = jnp.where(jnp.isfinite(posA), posA, -1e9)

        i_ar = jnp.arange(nq, dtype=jnp.float32)
        WA = jnp.maximum(
            0.0, 1.0 - jnp.abs(i_ar[None, :, None] - posA[:, None, :])
        ).astype(rs_dtype)  # (J, I, N)
        # inter[j, c, n] = sum_i img[i, j, c] * WA[j, i, n]
        inter = jax.lax.dot_general(
            jnp.transpose(img, (1, 0, 2)).astype(rs_dtype),  # (J, I, C)
            WA,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (J, C, N)

        if warp == "matmul_x":
            posB = lj  # (H, W): j position per (v, u)
            posB = jnp.where(jnp.isfinite(posB), posB, -1e9)
            WB = jnp.maximum(
                0.0,
                1.0 - jnp.abs(j_ar[None, :, None] - posB[:, None, :]),
            ).astype(rs_dtype)  # (H, J, W)
            pixT = jax.lax.dot_general(
                jnp.transpose(inter, (2, 0, 1)).astype(
                    rs_dtype
                ),  # (H, J, C)
                WB,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, C, W)
            pix = jnp.transpose(pixT, (0, 2, 1))  # (H, W, C)
        else:
            posB = jnp.transpose(lj, (1, 0))  # (W, H): j per (u, v)
            posB = jnp.where(jnp.isfinite(posB), posB, -1e9)
            WB = jnp.maximum(
                0.0,
                1.0 - jnp.abs(j_ar[None, :, None] - posB[:, None, :]),
            ).astype(rs_dtype)  # (W, J, H)
            pixT = jax.lax.dot_general(
                jnp.transpose(inter, (2, 0, 1)).astype(
                    rs_dtype
                ),  # (W, J, C)
                WB,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (W, C, H)
            pix = jnp.transpose(pixT, (2, 0, 1))  # (H, W, C)
    pix = jnp.where(behind[..., None], 0.0, pix)

    depth = pix[..., acc_ch]
    opacity = pix[..., acc_ch + 1]
    if cfg.deferred:
        # shade once per pixel: normalize the accumulated features by
        # opacity (an opacity-weighted average) and re-premultiply, so
        # fully transparent pixels stay black before background blending
        dirs_pix = dir_w / jnp.linalg.norm(dir_w, axis=-1, keepdims=True)
        feat_avg = pix[..., :acc_ch] / jnp.maximum(
            opacity[..., None], 1e-6
        )
        rgb = pyr.rgb_from_features(params, cfg, feat_avg, dirs_pix)
        rgb = rgb * opacity[..., None]
    else:
        rgb = pix[..., :3]
    if white_bg:
        rgb = rgb + (1.0 - opacity)[..., None]
    out = {
        "rgb": rgb.reshape(h_img * w_img, 3),
        "depth": depth.reshape(h_img * w_img),
        "opacity": opacity.reshape(h_img * w_img),
    }
    if want_distortion:
        out["distortion"] = pix[..., acc_ch + 2].reshape(h_img * w_img)
    if debug_frames:
        out["global_frame"] = img
        out["chunk_debug"] = chunk_dbg
    return out


def _pixel_slopes(pose, K, img_wh, axis, n_grid: int = 17):
    """Host helper: ray slopes (d_b/d_a, d_c/d_a) on a pixel grid."""
    import numpy as np

    w, h = img_wh
    u = np.linspace(0.0, w - 1.0, n_grid)
    v = np.linspace(0.0, h - 1.0, n_grid)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    K = np.asarray(K, np.float64)
    cam = np.stack(
        [
            (uu - K[0, 2] + 0.5) / K[0, 0],
            (vv - K[1, 2] + 0.5) / K[1, 1],
            np.ones_like(uu),
        ],
        axis=-1,
    )
    world = cam @ np.asarray(pose, np.float64)[:, :3].T
    b_axis, c_axis = [d for d in range(3) if d != axis]
    sb = world[..., b_axis] / world[..., axis]
    sc = world[..., c_axis] / world[..., axis]
    return sb, sc


def _matmul_solve_choice(
    pose, axis: int, sc_lo: float, sc_hi: float, tol: float = 1e-3
) -> str:
    """Host: pick the matmul warp's pass-A solve coordinate.

    The pass-A denominator for solve coordinate ``s`` is proportional to
    ``rc[s] - slope_c * ra[s]`` over the lattice's slope_c range
    (``rc``/``ra`` the c/sweep-axis rows of the camera rotation); a zero
    crossing inside the range sends that row's solve to infinity and the
    lattice rows near it compose garbage.  Returns "matmul" (solve for
    camera y — the historical default) when its denominator stays away
    from zero over ``[sc_lo, sc_hi]``, else "matmul_x", else "gather"
    (both solves singular, e.g. a ~45-degree-rolled camera with the
    singular slope in range).
    """
    import numpy as np

    r = np.asarray(pose, np.float64)[:, :3]
    c_axis = [d for d in range(3) if d != axis][1]
    ra, rc = r[axis], r[c_axis]
    pad = 0.05 * max(sc_hi - sc_lo, 0.1)
    lo, hi = sc_lo - pad, sc_hi + pad
    for s, name in ((1, "matmul"), (0, "matmul_x")):
        e0 = rc[s] - lo * ra[s]
        e1 = rc[s] - hi * ra[s]
        if e0 * e1 > 0 and min(abs(e0), abs(e1)) > tol:
            return name
    return "gather"


def pick_warp(
    pose,
    K,
    img_wh: Tuple[int, int],
    axis: int,
    face_sign: float | None = None,
    crop_xy: Tuple[int, int] = (0, 0),
    n_grid: int = 7,
) -> str:
    """Host: final-warp mode for one compiled (pose, face[, crop]) program.

    Samples ray slopes on an ``n_grid`` x ``n_grid`` pixel grid of the
    (cropped) view; ``face_sign`` (+-1) restricts to the pixels a cubemap
    face owns (matching the inside path's face-masked merge/loss), and
    delegates the conditioning test to :func:`_matmul_solve_choice`.
    """
    import numpy as np

    pose = np.asarray(pose, np.float64).reshape(3, 4)
    K = np.asarray(K, np.float64)
    w, h = img_wh
    u = crop_xy[0] + np.linspace(0.0, w - 1.0, n_grid)
    v = crop_xy[1] + np.linspace(0.0, h - 1.0, n_grid)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    cam = np.stack(
        [
            (uu - K[0, 2] + 0.5) / K[0, 0],
            (vv - K[1, 2] + 0.5) / K[1, 1],
            np.ones_like(uu),
        ],
        axis=-1,
    )
    d = cam @ pose[:, :3].T
    c_axis = [x for x in range(3) if x != axis][1]
    da = d[..., axis]
    if face_sign is not None:
        dom = np.argmax(np.abs(d), axis=-1)
        m = (dom == axis) & (face_sign * da > 0)
        if not m.any():
            return "matmul"
        sc = d[..., c_axis][m] / da[m]
    else:
        sc = d[..., c_axis] / np.where(np.abs(da) < 1e-12, 1e-12, da)
    return _matmul_solve_choice(
        pose, axis, float(sc.min()), float(sc.max())
    )


def face_slope_bounds(
    pose,
    K,
    img_wh: Tuple[int, int],
    axis: int,
    face_sign: float,
    crop_xy: Tuple[int, int] = (0, 0),
    n_grid: int = 17,
    pad: float = 0.02,
):
    """Host: tight (2, 2) slope bounds of a face's pixels in a crop.

    Samples ray slopes (d_b/d_a, d_c/d_a) on an ``n_grid`` grid of the
    crop, restricted to the pixels the cubemap face ``(axis,
    sign(face_sign))`` owns.  Returns ``[[sb_lo, sb_hi], [sc_lo,
    sc_hi]]`` (float32) for ``render_swr_fixed_axis``'s ``slope_bounds``,
    or None when the sampled grid has no face pixels.  Ends that reach
    the dominance boundary (|slope| > 0.9 — the sampled extremum can
    undershoot the true one there) extend to the full cone edge; interior
    ends keep the measured value + ``pad``.  Without this, training
    crops that straddle a face boundary fall back to cone-wide traced
    bounds and render ~4x blurrier than eval (which computes tight
    bounds per face on the host).
    """
    import numpy as np

    pose = np.asarray(pose, np.float64).reshape(3, 4)
    K = np.asarray(K, np.float64)
    w, h = img_wh
    u = crop_xy[0] + np.linspace(0.0, w - 1.0, n_grid)
    v = crop_xy[1] + np.linspace(0.0, h - 1.0, n_grid)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    cam = np.stack(
        [
            (uu - K[0, 2] + 0.5) / K[0, 0],
            (vv - K[1, 2] + 0.5) / K[1, 1],
            np.ones_like(uu),
        ],
        axis=-1,
    )
    d = cam @ pose[:, :3].T
    b_axis, c_axis = [x for x in range(3) if x != axis]
    da = d[..., axis]
    dom = np.argmax(np.abs(d), axis=-1)
    m = (dom == axis) & (face_sign * da > 0)
    if not m.any():
        return None
    out = np.empty((2, 2), np.float32)
    for row, ax in enumerate((b_axis, c_axis)):
        sl = d[..., ax][m] / da[m]
        lo, hi = float(sl.min()) - pad, float(sl.max()) + pad
        out[row, 0] = -1.05 if lo < -0.9 else lo
        out[row, 1] = 1.05 if hi > 0.9 else hi
    return out


def _max_window_span(arr, k: int) -> float:
    """Max (max - min) over any (k+1)x(k+1) sample window of a 2-D grid."""
    import numpy as np

    n = arr.shape[0]
    k = min(k, n - 1)
    best = 0.0
    for i in range(n - k):
        for j in range(arr.shape[1] - k):
            sub = arr[i : i + k + 1, j : j + k + 1]
            best = max(best, float(sub.max() - sub.min()))
    return best


def slab_window_bound(
    poses,
    K,
    img_wh: Tuple[int, int],
    cfg: pyr.PyramidConfig,
    crop: int | None = None,
    lat_pad: int = 16,
    safety: float = 1.1,
    lat_size: int = 0,
) -> int:
    """Static source-window width covering every slab resample.

    The per-slab resample step is ``frustum_width(z_k) / (h * (nq - 1 -
    lat_pad))``; its max over slabs/poses (and, for training, over all
    ``crop`` x ``crop`` sub-frusta) bounds the source support.  Returns 0
    (= use the full matmul) when the bound reaches the grid resolution.
    ``lat_size`` overrides the lattice side (must match the render call's
    ``lat_size``); the frustum span still comes from ``crop`` pixels.
    """
    import numpy as np

    R, s = cfg.grid_res, cfg.scale
    h = 2.0 * s / R
    w_img, h_img = img_wh
    out_side = crop if crop else max(img_wh)
    nq = lat_size if lat_size else out_side + lat_pad
    denom = (nq - 1 - lat_pad) * h
    n_grid = 17
    if crop:
        ku = int(np.ceil((crop - 1) / max(w_img - 1, 1) * (n_grid - 1))) + 1
        kv = int(np.ceil((crop - 1) / max(h_img - 1, 1) * (n_grid - 1))) + 1
        k = max(ku, kv)
    else:
        k = n_grid - 1
    step_max = 0.0
    for p in np.asarray(poses, np.float32).reshape(-1, 3, 4):
        axis = int(np.argmax(np.abs(p[:, 2])))
        sb, sc = _pixel_slopes(p, K, img_wh, axis, n_grid)
        dist = abs(float(p[axis, 3])) + s
        for arr in (sb, sc):
            span = _max_window_span(arr, k)
            step_max = max(step_max, dist * span / denom)
    from ..ops.warp import resample_window

    win = resample_window(step_max * safety, nq)
    # measured on v5e: the dynamic-slice + pad overhead of the windowed
    # path only pays off once the matmul shrinks ~4x; otherwise full matmul
    return 0 if win * 4 > R else win


def render_swr(
    params,
    grid: jnp.ndarray,
    cfg: pyr.PyramidConfig,
    pose,
    K,
    img_wh: Tuple[int, int],
    lat_cap: int | None = None,
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Host wrapper: picks the dominant sweep axis from the concrete pose.

    ``lat_cap`` bounds the intermediate-lattice side (the lattice only
    needs to resolve the R-cell grid; the final warp magnifies) — pass
    e.g. ``int(1.25 * cfg.grid_res)`` for fast high-resolution renders.
    """
    import numpy as np

    kw.pop("dist_min", None)  # legacy knob of the roll-select variant
    pose = jnp.asarray(pose, jnp.float32)
    fwd = np.asarray(pose[:, 2])
    axis = int(np.argmax(np.abs(fwd)))
    # sweep front-to-back: nearest slab first, i.e. descending z when the
    # camera sits on the +axis side
    flip = bool(np.asarray(pose)[axis, 3] > 0)
    lat_pad = kw.get("lat_pad", 16)
    if lat_cap and max(img_wh) + lat_pad > lat_cap:
        kw["lat_size"] = lat_cap
    if "warp" not in kw:
        kw["warp"] = pick_warp(pose, K, tuple(img_wh), axis)
    return render_swr_fixed_axis(
        params, grid, cfg, pose, jnp.asarray(K, jnp.float32), tuple(img_wh),
        axis, flip, **kw,
    )


def pixel_faces(pose, K, img_wh: Tuple[int, int]):
    """Host helper: per-pixel cubemap face of each ray direction.

    Returns ``(dom, pos, faces)``: ``dom[h, w]`` the dominant world axis,
    ``pos[h, w]`` True where that component is positive, and ``faces`` the
    sorted list of distinct ``(axis, positive)`` pairs present.
    """
    import numpy as np

    w, h = img_wh
    K = np.asarray(K, np.float64)
    pose = np.asarray(pose, np.float64).reshape(3, 4)
    uu, vv = np.meshgrid(
        np.arange(w, dtype=np.float64),
        np.arange(h, dtype=np.float64),
        indexing="xy",
    )
    cam = np.stack(
        [
            (uu - K[0, 2] + 0.5) / K[0, 0],
            (vv - K[1, 2] + 0.5) / K[1, 1],
            np.ones_like(uu),
        ],
        axis=-1,
    )
    dir_w = cam @ pose[:, :3].T  # (h, w, 3)
    dom = np.argmax(np.abs(dir_w), axis=-1)
    d_dom = np.take_along_axis(dir_w, dom[..., None], axis=-1)[..., 0]
    pos = d_dom > 0
    faces = sorted(
        {(int(a), bool(p)) for a, p in zip(dom.ravel(), pos.ravel())}
    )
    return dom, pos, faces, dir_w


def render_swr_inside(
    params,
    grid,
    cfg: pyr.PyramidConfig,
    pose,
    K,
    img_wh: Tuple[int, int],
    lat_cap: int | None = None,
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Render a camera *inside* the grid by cubemap-face decomposition.

    The image's rays are partitioned by dominant signed axis (up to 6
    faces; typically 1-3 for a normal FOV); each face runs one
    ``inside=True`` sweep outward from the camera, and the face images
    merge per-pixel.  This is the dense path's answer to the reference's
    inside-the-scene COLMAP rigs (360_v2 etc.), which the outside-only
    sweep (:func:`render_swr`) rejects.
    """
    import numpy as np

    pose = jnp.asarray(pose, jnp.float32)
    K_j = jnp.asarray(K, jnp.float32)
    w_img, h_img = img_wh
    dom, pos, faces, dir_w = pixel_faces(pose, K, img_wh)
    kw.pop("dist_min", None)
    lat_pad = kw.get("lat_pad", 16)
    if lat_cap and max(img_wh) + lat_pad > lat_cap:
        kw["lat_size"] = lat_cap
    out = None
    for a, p in faces:
        # tight per-face slope bounds from the face's actual pixels —
        # the fallback cone bound (+-1.05) wastes ~4x lattice resolution
        # on a normal-FOV image
        b_ax, c_ax = [d for d in range(3) if d != a]
        m = (dom == a) & (pos == p)
        da = dir_w[..., a][m]
        sb = dir_w[..., b_ax][m] / da
        sc = dir_w[..., c_ax][m] / da
        pad = 0.02
        bounds = jnp.asarray(
            [
                [sb.min() - pad, sb.max() + pad],
                [sc.min() - pad, sc.max() + pad],
            ],
            jnp.float32,
        )
        face_kw = kw
        if "warp" not in kw:
            # per-face solve-coordinate pick: a sliver face's lattice c
            # axis can align with image x, making the default y-solve
            # singular (_matmul_solve_choice docstring)
            face_kw = dict(
                kw,
                warp=_matmul_solve_choice(
                    np.asarray(pose),
                    a,
                    float(sc.min()) - pad,
                    float(sc.max()) + pad,
                ),
            )
        r = render_swr_fixed_axis(
            params, grid, cfg, pose, K_j, tuple(img_wh),
            a, not p, inside=True, slope_bounds=bounds, **face_kw,
        )
        mask = jnp.asarray(
            ((dom == a) & (pos == p)).reshape(-1), jnp.bool_
        )
        if out is None:
            out = {
                k: jnp.where(
                    mask[:, None] if v.ndim == 2 else mask, v, 0.0
                )
                for k, v in r.items()
            }
        else:
            out = {
                k: jnp.where(
                    mask[:, None] if v.ndim == 2 else mask, v, out[k]
                )
                for k, v in r.items()
            }
    return out
