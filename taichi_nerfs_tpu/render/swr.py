"""Shear-warp frustum renderer — the dense (gather-free) TPU path.

Renders a pinhole view of a dense feature grid by sweeping it slab-by-slab
along the dominant view axis (object-order shear-warp, perspective variant —
see docs/shear_warp.md).  Every operation is a dense slice, roll-select
resample (ops/warp.py), cumulative composite, or MXU matmul; the single
gather in the pipeline is the final intermediate-frame -> pixel warp
(one bilinear gather per pixel).

Geometry
--------
Scene cube ``[-s, s]^3``, grid ``(R, R, R, F)`` with voxel centers at
``-s + (i + 0.5) * h`` (``h = 2s/R``).  For a camera at ``o`` with dominant
axis ``a``: slab ``k`` lives on the world plane ``z_k``; projecting a slab
point ``p`` toward the eye onto a reference plane ``z_ref`` gives
``q = o + (p - o) * rho`` with ``rho = (z_ref - o_a)/(z_k - o_a)`` — affine
per slab, hence two 1D affine resamples.  Slabs composite front-to-back in
per-chunk intermediate frames (chunking keeps ``|step - 1|`` small for the
roll-select window); chunk frames fold into a global frame at the cube
center plane, and one final projective warp lands on pixels.

Restrictions (v1): the camera must be outside the cube along the dominant
axis (``|o_a| > s + margin``) — true for the synthetic-NeRF/NSVF rigs.  The
general-camera path remains the sample renderer (``renderer.py``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import pyramid as pyr
from ..ops.warp import resample_affine, residual_window


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "img_wh",
        "axis",
        "flip",
        "n_chunks",
        "q_pad",
        "dist_min",
        "white_bg",
        "debug_frames",
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
    q_pad: int | None = None,
    dist_min: float = 0.35,
    white_bg: bool = True,
    debug_frames: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Render with a statically chosen sweep axis/direction.

    Args:
        params: pyramid params (rgb MLP).
        grid: baked (R, R, R, F) grid, world-indexed [x, y, z].
        axis: static dominant world axis (0/1/2).
        flip: static — the camera sits on the +axis side (sweep descending).
        q_pad: lattice margin cells (cube content expands toward the eye
            when projected to the center plane); default R//2, making the
            lattice 2R — lane-tiling friendly.
        dist_min: static lower bound on |o_axis| - s used to size the
            roll-select windows; cameras closer than this are out of spec.
    """
    s = cfg.scale
    R = cfg.grid_res
    F = cfg.features
    h = 2.0 * s / R
    if q_pad is None:
        q_pad = R // 2
    w_img, h_img = img_wh

    b_axis, c_axis = [d for d in range(3) if d != axis]
    # vol: (D, F, Rb, Rc) — channel-leading minor block keeps (sublane,
    # lane) = (Rb, Rc) dense
    vol = jnp.transpose(grid, (axis, 3, b_axis, c_axis))
    zs = -s + (jnp.arange(R, dtype=jnp.float32) + 0.5) * h
    if flip:
        vol = vol[::-1]
        zs = zs[::-1]

    o = pose[:, 3]
    o_a, o_b, o_c = o[axis], o[b_axis], o[c_axis]

    # intermediate lattice (shared extent for every frame)
    nq = R + 2 * q_pad
    q0 = -s + (0.5 - q_pad) * h
    qb = q0 + jnp.arange(nq, dtype=jnp.float32) * h  # world b coords
    qc = q0 + jnp.arange(nq, dtype=jnp.float32) * h

    # static roll-select windows
    d_chunk = (R // n_chunks) * h
    delta_slab = (0.5 * d_chunk + h) / dist_min
    win_slab = residual_window(1.0 - delta_slab, 1.0 + delta_slab, nq)
    delta_glob = (s + h) / dist_min
    win_glob = residual_window(
        1.0 / (1.0 + delta_glob), 1.0 + delta_glob, nq
    )

    dc = R // n_chunks
    vol_c = vol.reshape(n_chunks, dc, F, R, R)
    zs_c = zs.reshape(n_chunks, dc)

    def chunk_body(carry, inp):
        rgb_g, depth_g, t_g = carry
        slabs, z_slabs = inp
        z_ref = jnp.mean(z_slabs)

        # rays through the chunk lattice: P = (z_ref at axis, qb, qc)
        vb = qb[:, None] - o_b  # (nq, 1)
        vc = qc[None, :] - o_c  # (1, nq)
        va = z_ref - o_a
        norm = jnp.sqrt(va * va + vb * vb + vc * vc)  # (nq, nq)
        inv_da = norm / jnp.abs(va)
        dt = h * inv_da  # per-lattice step length along the ray
        # world-order unit direction for the SH encoding
        comps = [None, None, None]
        comps[axis] = jnp.broadcast_to(va / norm, (nq, nq))
        comps[b_axis] = jnp.broadcast_to(vb / norm, (nq, nq))
        comps[c_axis] = jnp.broadcast_to(vc / norm, (nq, nq))
        dirs = jnp.stack(comps, axis=-1)  # (nq, nq, 3)

        def slab_body(carry_s, inp_s):
            rgb_acc, depth_acc, t_acc = carry_s
            slab, z_k = inp_s  # (F, R, R), ()
            rho = (z_ref - o_a) / (z_k - o_a)
            step = 1.0 / rho
            # source index m(i) = (o_b + (q_i - o_b)/rho + s)/h - 0.5
            start_b = (o_b + (qb[0] - o_b) / rho + s) / h - 0.5
            start_c = (o_c + (qc[0] - o_c) / rho + s) / h - 0.5
            sq = resample_affine(
                slab, start_b, step, nq, win_slab[0], win_slab[1], axis=1
            )
            sq = resample_affine(
                sq, start_c, step, nq, win_slab[0], win_slab[1], axis=2
            )  # (F, nq, nq)
            slab_q = jnp.moveaxis(sq, 0, -1)  # (nq, nq, F)
            sigma = pyr.density_from_grid(slab_q)
            feats = slab_q[..., 1:]  # (nq, nq, F-1)
            rgb = pyr.rgb_from_features(params, cfg, feats, dirs)
            alpha = 1.0 - jnp.exp(-sigma * dt)
            w = alpha * t_acc
            t_ray = (z_k - o_a) * inv_da * jnp.sign(va)
            rgb_acc = rgb_acc + w[..., None] * rgb
            depth_acc = depth_acc + w * t_ray
            t_acc = t_acc * (1.0 - alpha)
            return (rgb_acc, depth_acc, t_acc), None

        init = (
            jnp.zeros((nq, nq, 3), jnp.float32),
            jnp.zeros((nq, nq), jnp.float32),
            jnp.ones((nq, nq), jnp.float32),
        )
        (rgb_c, depth_c, t_c), _ = jax.lax.scan(
            slab_body, init, (slabs, z_slabs)
        )

        # fold the chunk frame into the global frame (cube-center plane):
        # q_global -> q_chunk scale = (z_ref - o_a)/(0 - o_a)
        rho_g = (0.0 - o_a) / (z_ref - o_a)
        step_g = 1.0 / rho_g
        start_g = (o_b + (qb[0] - o_b) / rho_g + s) / h - 0.5 + q_pad
        start_gc = (o_c + (qc[0] - o_c) / rho_g + s) / h - 0.5 + q_pad
        packed = jnp.concatenate(
            [
                jnp.moveaxis(rgb_c, -1, 0),
                depth_c[None],
                (1.0 - t_c)[None],
            ],
            axis=0,
        )  # (5, nq, nq)
        packed = resample_affine(
            packed, start_g, step_g, nq, win_glob[0], win_glob[1], axis=1
        )
        packed = resample_affine(
            packed, start_gc, step_g, nq, win_glob[0], win_glob[1], axis=2
        )
        rgb_w = jnp.moveaxis(packed[:3], 0, -1)
        depth_w = packed[3]
        t_w = 1.0 - packed[4]
        rgb_g = rgb_g + t_g[..., None] * rgb_w
        depth_g = depth_g + t_g * depth_w
        t_g = t_g * t_w
        dbg = (rgb_c, t_c, packed) if debug_frames else None
        return (rgb_g, depth_g, t_g), dbg

    init_g = (
        jnp.zeros((nq, nq, 3), jnp.float32),
        jnp.zeros((nq, nq), jnp.float32),
        jnp.ones((nq, nq), jnp.float32),
    )
    (rgb_g, depth_g, t_g), chunk_dbg = jax.lax.scan(
        chunk_body, init_g, (vol_c, zs_c)
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
    dir_w = jnp.einsum("ij,hwj->hwi", pose[:, :3], dir_cam)
    da = dir_w[..., axis]
    t_hit = (0.0 - o_a) / da
    pb = o_b + t_hit * dir_w[..., b_axis]
    pc = o_c + t_hit * dir_w[..., c_axis]
    li = (pb + s) / h - 0.5 + q_pad
    lj = (pc + s) / h - 0.5 + q_pad
    behind = t_hit <= 0.0

    img = jnp.concatenate(
        [rgb_g, depth_g[..., None], (1.0 - t_g)[..., None]], axis=-1
    )  # (nq, nq, 5)

    i0 = jnp.clip(jnp.floor(li).astype(jnp.int32), 0, nq - 2)
    j0 = jnp.clip(jnp.floor(lj).astype(jnp.int32), 0, nq - 2)
    fi = jnp.clip(li - i0, 0.0, 1.0)
    fj = jnp.clip(lj - j0, 0.0, 1.0)
    g00 = img[i0, j0]
    g01 = img[i0, j0 + 1]
    g10 = img[i0 + 1, j0]
    g11 = img[i0 + 1, j0 + 1]
    pix = (
        g00 * ((1 - fi) * (1 - fj))[..., None]
        + g01 * ((1 - fi) * fj)[..., None]
        + g10 * (fi * (1 - fj))[..., None]
        + g11 * (fi * fj)[..., None]
    )
    pix = jnp.where(behind[..., None], 0.0, pix)

    rgb = pix[..., :3]
    depth = pix[..., 3]
    opacity = pix[..., 4]
    if white_bg:
        rgb = rgb + (1.0 - opacity)[..., None]
    out = {
        "rgb": rgb.reshape(h_img * w_img, 3),
        "depth": depth.reshape(h_img * w_img),
        "opacity": opacity.reshape(h_img * w_img),
    }
    if debug_frames:
        out["global_frame"] = img
        out["chunk_debug"] = chunk_dbg
    return out


def render_swr(
    params,
    grid: jnp.ndarray,
    cfg: pyr.PyramidConfig,
    pose,
    K,
    img_wh: Tuple[int, int],
    **kw,
) -> Dict[str, jnp.ndarray]:
    """Host wrapper: picks the dominant sweep axis from the concrete pose."""
    import numpy as np

    pose = jnp.asarray(pose, jnp.float32)
    fwd = np.asarray(pose[:, 2])
    axis = int(np.argmax(np.abs(fwd)))
    # sweep front-to-back: nearest slab first, i.e. descending z when the
    # camera sits on the +axis side
    flip = bool(np.asarray(pose)[axis, 3] > 0)
    return render_swr_fixed_axis(
        params, grid, cfg, pose, jnp.asarray(K, jnp.float32), tuple(img_wh),
        axis, flip, **kw,
    )
