"""Shear-warp renderer vs an exact per-ray numpy oracle.

The oracle marches every pixel ray across the same slab planes, samples the
baked grid with exact trilinear interpolation, evaluates the same rgb MLP,
and composites front-to-back.  The renderer's only approximations are its
separable bilinear resamples, so the images must agree closely (PSNR).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_nerfs_tpu.data.synthetic import look_at
from taichi_nerfs_tpu.models import pyramid as pyr
from taichi_nerfs_tpu.render.swr import render_swr


def _np_sh16(d):
    from taichi_nerfs_tpu.ops.sh import sh_encode

    return np.asarray(sh_encode(jnp.asarray(d, jnp.float32)))


def _np_mlp(params, x):
    h = x
    for i in range(3):
        w = np.asarray(params[f"w{i}"], np.float64)
        h = h @ w
        if i < 2:
            h = np.maximum(h, 0.0)
    return 1.0 / (1.0 + np.exp(-h))


def _trilinear_vec(grid, p, s, h):
    """(N, 3) world points -> (N, F) trilinear samples, zero outside."""
    R = grid.shape[0]
    x = (p + s) / h - 0.5  # (N, 3)
    b = np.floor(x).astype(int)
    f = x - b
    out = np.zeros((p.shape[0], grid.shape[-1]))
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                q = b + np.array([dx, dy, dz])
                ok = np.all((q >= 0) & (q <= R - 1), axis=1)
                qc = np.clip(q, 0, R - 1)
                w = (
                    np.where(dx, f[:, 0], 1 - f[:, 0])
                    * np.where(dy, f[:, 1], 1 - f[:, 1])
                    * np.where(dz, f[:, 2], 1 - f[:, 2])
                ) * ok
                out += w[:, None] * grid[qc[:, 0], qc[:, 1], qc[:, 2]]
    return out


def _oracle(grid, params, cfg, pose, K, wh):
    s, R = cfg.scale, cfg.grid_res
    h = 2.0 * s / R
    w_img, h_img = wh
    o = pose[:, 3]
    axis = int(np.argmax(np.abs(pose[:, 2])))
    zs = -s + (np.arange(R) + 0.5) * h
    if o[axis] > 0:
        zs = zs[::-1]
    uu, vv = np.meshgrid(np.arange(w_img), np.arange(h_img), indexing="xy")
    dc = np.stack(
        [
            (uu.ravel() - K[0, 2] + 0.5) / K[0, 0],
            (vv.ravel() - K[1, 2] + 0.5) / K[1, 1],
            np.ones(w_img * h_img),
        ],
        axis=1,
    )
    d = dc @ pose[:, :3].T
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = d.shape[0]
    denc = _np_sh16((d + 1.0) / 2.0)  # (N, 16)
    T = np.ones(n)
    rgb = np.zeros((n, 3))
    dt = h / np.abs(d[:, axis])
    for z in zs:
        t = (z - o[axis]) / d[:, axis]
        live = t > 0
        p = o[None, :] + t[:, None] * d
        g = _trilinear_vec(grid, p, s, h)
        # baked grid channel 0 is sigma already
        sigma = np.maximum(g[:, 0], 0.0) * live
        c = _np_mlp(
            params["rgb_mlp"], np.concatenate([denc, g[:, 1:]], axis=1)
        )
        alpha = 1.0 - np.exp(-sigma * dt)
        rgb += (alpha * T)[:, None] * c
        T *= 1.0 - alpha
    return rgb + T[:, None]  # white bg


@pytest.fixture(scope="module")
def setup():
    cfg = pyr.PyramidConfig(
        resolutions=(16, 32), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0,
    )
    key = jax.random.PRNGKey(0)
    params = pyr.init_pyramid_params(key, cfg)
    # a soft blob of density so rays see structure
    R = cfg.grid_res
    c = (jnp.arange(R) + 0.5) / R - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx**2 + yy**2 + zz**2)
    blob = 2.0 * jnp.exp(-((r / 0.25) ** 2))
    lv = params["levels"][1]
    params["levels"][1] = lv.at[..., 0].add(blob)
    grid = pyr.bake(params, cfg)
    return cfg, params, grid


@pytest.mark.parametrize(
    "eye",
    [
        (0.1, 0.15, -1.3),  # near-axis-aligned
        (0.8, 0.5, -1.1),  # oblique, z-dominant
        (1.3, 0.3, 0.2),  # x-dominant, positive side
    ],
)
def test_swr_matches_oracle(setup, eye):
    cfg, params, grid = setup
    w = h = 32
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.asarray(eye, np.float64), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    out = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8
    )
    got = np.asarray(out["rgb"])
    want = _oracle(
        np.asarray(grid, np.float64), params, cfg, pose, K, (w, h)
    )
    mse = float(np.mean((got - want) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 24.0, f"swr/oracle mismatch: psnr={psnr:.2f}"
    # opacity sanity: some rays hit the blob
    assert float(np.max(out["opacity"])) > 0.3


def _oracle_deferred(grid, params, cfg, pose, K, wh):
    """Per-ray oracle of the deferred model: composite features, then one
    MLP per pixel on the opacity-normalized accumulated feature vector."""
    s, R = cfg.scale, cfg.grid_res
    h = 2.0 * s / R
    w_img, h_img = wh
    o = pose[:, 3]
    axis = int(np.argmax(np.abs(pose[:, 2])))
    zs = -s + (np.arange(R) + 0.5) * h
    if o[axis] > 0:
        zs = zs[::-1]
    uu, vv = np.meshgrid(np.arange(w_img), np.arange(h_img), indexing="xy")
    dc = np.stack(
        [
            (uu.ravel() - K[0, 2] + 0.5) / K[0, 0],
            (vv.ravel() - K[1, 2] + 0.5) / K[1, 1],
            np.ones(w_img * h_img),
        ],
        axis=1,
    )
    d = dc @ pose[:, :3].T
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = d.shape[0]
    T = np.ones(n)
    feat = np.zeros((n, cfg.features - 1))
    dt = h / np.abs(d[:, axis])
    for z in zs:
        t = (z - o[axis]) / d[:, axis]
        live = t > 0
        p = o[None, :] + t[:, None] * d
        g = _trilinear_vec(grid, p, s, h)
        sigma = np.maximum(g[:, 0], 0.0) * live
        alpha = 1.0 - np.exp(-sigma * dt)
        feat += (alpha * T)[:, None] * g[:, 1:]
        T *= 1.0 - alpha
    opacity = 1.0 - T
    denc = _np_sh16((d + 1.0) / 2.0)
    feat_avg = feat / np.maximum(opacity[:, None], 1e-6)
    rgb = _np_mlp(
        params["rgb_mlp"], np.concatenate([denc, feat_avg], axis=1)
    )
    return rgb * opacity[:, None] + T[:, None]  # white bg


@pytest.mark.parametrize("eye", [(0.1, 0.15, -1.3), (1.3, 0.3, 0.2)])
def test_swr_deferred_matches_oracle(setup, eye):
    cfg0, params, grid = setup
    import dataclasses

    cfg = dataclasses.replace(cfg0, deferred=True)
    w = h = 32
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.asarray(eye, np.float64), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    out = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=8)
    got = np.asarray(out["rgb"])
    want = _oracle_deferred(
        np.asarray(grid, np.float64), params, cfg, pose, K, (w, h)
    )
    mse = float(np.mean((got - want) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 24.0, f"deferred swr/oracle mismatch: psnr={psnr:.2f}"


def test_swr_skip_empty_matches(setup):
    """skip_empty branches around zero-sigma slabs without changing the
    image (hand-built grid: sigma only in a central band of slabs)."""
    cfg, params, _ = setup
    R, F = cfg.grid_res, cfg.features
    rng = np.random.default_rng(7)
    grid = np.zeros((R, R, R, F), np.float32)
    band = slice(R // 2 - 4, R // 2 + 4)
    grid[band, band, band, 0] = 3.0  # sigma
    grid[band, band, band, 1:] = rng.normal(size=(8, 8, 8, F - 1))
    grid = jnp.asarray(grid)
    w = h = 24
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.2, 0.3, -1.4]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    )
    a = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=8)
    b = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8, skip_empty=True
    )
    np.testing.assert_allclose(
        np.asarray(b["rgb"]), np.asarray(a["rgb"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b["opacity"]), np.asarray(a["opacity"]), atol=1e-5
    )


def test_swr_split_resolution_matches_oracle():
    """Split grid (sigma at 2R, features at R): per-ray oracle marches
    the sigma sub-slab planes, shares the feature value across each
    sub-slab pair, composites front-to-back (deferred shading)."""
    import dataclasses

    cfg = pyr.PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0, sigma_res=32, deferred=True,
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(1), cfg)
    Rs = cfg.sigma_res
    c = (jnp.arange(Rs) + 0.5) / Rs - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx**2 + yy**2 + zz**2)
    params["sigma_level"] = params["sigma_level"] + 2.0 * jnp.exp(
        -((r / 0.25) ** 2)
    )
    grid = pyr.bake(params, cfg)
    sigma_np = np.asarray(grid[0], np.float64)[..., None]
    feat_np = np.asarray(grid[1], np.float64)

    w = h = 32
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.15, 0.25, -1.3]), np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
    ).astype(np.float64)

    out = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=4)
    got = np.asarray(out["rgb"])

    # ---- oracle
    s, R = cfg.scale, cfg.grid_res
    hf, hs = 2.0 * s / R, 2.0 * s / Rs
    o = pose[:, 3]
    axis = int(np.argmax(np.abs(pose[:, 2])))
    zf = -s + (np.arange(R) + 0.5) * hf
    zsub = -s + (np.arange(Rs) + 0.5) * hs
    if o[axis] > 0:
        zf, zsub = zf[::-1], zsub[::-1]
    zsub = zsub.reshape(R, 2)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dc = np.stack(
        [
            (uu.ravel() - K[0, 2] + 0.5) / K[0, 0],
            (vv.ravel() - K[1, 2] + 0.5) / K[1, 1],
            np.ones(w * h),
        ],
        axis=1,
    )
    d = dc @ pose[:, :3].T
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = d.shape[0]
    T = np.ones(n)
    feat_acc = np.zeros((n, cfg.features - 1))
    dts = hs / np.abs(d[:, axis])
    for j in range(R):
        t_f = (zf[j] - o[axis]) / d[:, axis]
        p_f = o[None, :] + t_f[:, None] * d
        fj = _trilinear_vec(feat_np, p_f, s, hf)
        ws = np.zeros(n)
        for i_sub in range(2):
            t_s = (zsub[j, i_sub] - o[axis]) / d[:, axis]
            live = t_s > 0
            p_s = o[None, :] + t_s[:, None] * d
            sg = np.maximum(
                _trilinear_vec(sigma_np, p_s, s, hs)[:, 0], 0.0
            ) * live
            a = 1.0 - np.exp(-sg * dts)
            ws += a * T
            T *= 1.0 - a
        feat_acc += ws[:, None] * fj
    opacity = 1.0 - T
    denc = _np_sh16((d + 1.0) / 2.0)
    feat_avg = feat_acc / np.maximum(opacity[:, None], 1e-6)
    want = (
        _np_mlp(
            params["rgb_mlp"], np.concatenate([denc, feat_avg], axis=1)
        )
        * opacity[:, None]
        + T[:, None]
    )
    mse = float(np.mean((got - want) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 24.0, f"split swr/oracle mismatch: psnr={psnr:.2f}"
    assert float(np.max(out["opacity"])) > 0.3


def test_swr_distortion_matches_pairwise_oracle(setup):
    """Running-sum distortion (incl. cross-chunk fold terms) == the full
    pairwise Mip-NeRF-360 sum, per ray (reference modules/distortion.py)."""
    cfg, params, grid = setup
    w = h = 32
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.15, 0.2, -1.25]), np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
    ).astype(np.float64)
    out = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8,
        want_distortion=True,
    )
    got = np.asarray(out["distortion"])

    # pairwise oracle on the same slab lattice
    s, R = cfg.scale, cfg.grid_res
    hh = 2.0 * s / R
    o = pose[:, 3]
    axis = int(np.argmax(np.abs(pose[:, 2])))
    zs = -s + (np.arange(R) + 0.5) * hh
    if o[axis] > 0:
        zs = zs[::-1]
    uu, vv = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dc = np.stack(
        [
            (uu.ravel() - K[0, 2] + 0.5) / K[0, 0],
            (vv.ravel() - K[1, 2] + 0.5) / K[1, 1],
            np.ones(w * h),
        ],
        axis=1,
    )
    d = dc @ pose[:, :3].T
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = d.shape[0]
    T = np.ones(n)
    dts = hh / np.abs(d[:, axis])
    ws_all, ts_all = [], []
    gridf = np.asarray(grid, np.float64)
    for z in zs:
        t = (z - o[axis]) / d[:, axis]
        live = t > 0
        p = o[None, :] + t[:, None] * d
        g = _trilinear_vec(gridf, p, s, hh)
        sigma = np.maximum(g[:, 0], 0.0) * live
        a = 1.0 - np.exp(-sigma * dts)
        ws_all.append(a * T)
        ts_all.append(t)
        T *= 1.0 - a
    W = np.stack(ws_all, 1)  # (n, R)
    Tm = np.stack(ts_all, 1)
    want = (
        np.einsum("ni,nj,nij->n", W, W, np.abs(Tm[:, :, None] - Tm[:, None, :]))
        + np.sum(W * W, 1) * dts / 3.0
    )
    # the renderer computes distortion of *interpolated* weights, so ray-
    # by-ray values smooth at silhouette edges (max rel ~14%); the RMS
    # and the mean (what the loss actually uses) agree tightly.  The
    # chunk fold is exact: n_chunks=1 and 8 produce identical maps.
    rms = float(
        np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    )
    mean_rel = abs(got.mean() - want.mean()) / max(abs(want.mean()), 1e-9)
    assert rms < 0.05, f"distortion mismatch: rms={rms:.4f}"
    assert mean_rel < 0.02, f"distortion mean off: {mean_rel:.4f}"


def _oracle_inside(grid, params, cfg, pose, K, wh):
    """Per-ray oracle for inside cameras: every pixel marches the slab
    planes of ITS dominant signed axis, camera-side slabs only (matching
    the face-split renderer's half-slab margin)."""
    s, R = cfg.scale, cfg.grid_res
    h = 2.0 * s / R
    w_img, h_img = wh
    o = pose[:, 3]
    uu, vv = np.meshgrid(np.arange(w_img), np.arange(h_img), indexing="xy")
    dc = np.stack(
        [
            (uu.ravel() - K[0, 2] + 0.5) / K[0, 0],
            (vv.ravel() - K[1, 2] + 0.5) / K[1, 1],
            np.ones(w_img * h_img),
        ],
        axis=1,
    )
    d = dc @ pose[:, :3].T
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n = d.shape[0]
    dom = np.argmax(np.abs(d), axis=1)
    denc = _np_sh16((d + 1.0) / 2.0)
    zs0 = -s + (np.arange(R) + 0.5) * h
    rgb = np.zeros((n, 3))
    T_out = np.ones(n)
    for a in range(3):
        for sign in (-1.0, 1.0):
            sel = (dom == a) & (np.sign(d[:, a]) == sign)
            if not sel.any():
                continue
            dsel = d[sel]
            zs = zs0 if sign > 0 else zs0[::-1]
            T = np.ones(sel.sum())
            acc = np.zeros((sel.sum(), 3))
            dt = h / np.abs(dsel[:, a])
            for z in zs:
                if sign * (z - o[a]) <= 0.5 * h:
                    continue  # behind the camera / camera slab
                t = (z - o[a]) / dsel[:, a]
                p = o[None, :] + t[:, None] * dsel
                g = _trilinear_vec(grid, p, s, h)
                sigma = np.maximum(g[:, 0], 0.0)
                c = _np_mlp(
                    params["rgb_mlp"],
                    np.concatenate([denc[sel], g[:, 1:]], axis=1),
                )
                alpha = 1.0 - np.exp(-sigma * dt)
                acc += (alpha * T)[:, None] * c
                T *= 1.0 - alpha
            rgb[sel] = acc
            T_out[sel] = T
    return rgb + T_out[:, None]  # white bg


@pytest.mark.parametrize(
    "eye,target",
    [
        ((0.1, 0.05, -0.2), (0.0, 0.0, 0.3)),  # inside, one face
        ((0.3, 0.25, 0.2), (-0.4, -0.4, -0.3)),  # inside, oblique
        ((0.0, 0.0, 0.0), (1.0, 0.4, 0.45)),  # dead center, multi-face
    ],
)
def test_swr_inside_matches_oracle(setup, eye, target):
    from taichi_nerfs_tpu.render.swr import render_swr_inside

    cfg, params, grid = setup
    w = h = 32
    focal = 0.7 * w  # wide FOV: more face mixing
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.asarray(eye, np.float64),
        np.asarray(target, np.float64),
        np.array([0.0, 0.0, 1.0]),
    ).astype(np.float64)
    out = render_swr_inside(
        params, grid, cfg, pose, K, (w, h), n_chunks=8
    )
    got = np.asarray(out["rgb"])
    want = _oracle_inside(
        np.asarray(grid, np.float64), params, cfg, pose, K, (w, h)
    )
    assert np.isfinite(got).all()
    mse = float(np.mean((got - want) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 24.0, f"inside swr/oracle mismatch: psnr={psnr:.2f}"


def test_swr_inside_outside_consistent(setup):
    """An outside camera rendered through the inside (face-split) path
    agrees with the standard outside sweep."""
    from taichi_nerfs_tpu.render.swr import render_swr_inside

    cfg, params, grid = setup
    w = h = 24
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.1, 0.2, -1.3]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    a = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=8)
    b = render_swr_inside(params, grid, cfg, pose, K, (w, h), n_chunks=8)
    mse = float(
        np.mean((np.asarray(a["rgb"]) - np.asarray(b["rgb"])) ** 2)
    )
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 30.0, f"inside-path regression on outside camera: {psnr}"


def test_swr_warp_solve_transposed_matches(setup):
    """The transposed pass-A solve ("matmul_x") agrees with the default
    y-solve and the gather warp where all three are well-posed."""
    cfg, params, grid = setup
    w = h = 32
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.3, 0.2, -1.3]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    outs = {
        wp: np.asarray(
            render_swr(
                params, grid, cfg, pose, K, (w, h), n_chunks=8, warp=wp
            )["rgb"]
        )
        for wp in ("matmul", "matmul_x", "gather")
    }
    for wp in ("matmul_x", "gather"):
        mse = float(np.mean((outs["matmul"] - outs[wp]) ** 2))
        psnr = -10 * np.log10(mse + 1e-12)
        assert psnr > 35.0, f"warp={wp} disagrees: psnr={psnr:.2f}"


def test_swr_inside_singular_face_no_streak(setup):
    """Regression: a cubemap sliver face whose lattice c axis aligns with
    image x makes the default y-solve singular (den crosses zero inside
    the lattice's slope range) — rows near the zero composed garbage and
    pixels there came out with opacity 0 (a streak).  The per-face solve
    pick must route such faces to "matmul_x" (or gather) and match the
    gather oracle."""
    from taichi_nerfs_tpu.render.swr import (
        _matmul_solve_choice,
        pixel_faces,
        render_swr_inside,
    )

    cfg, params, grid = setup
    w = h = 48
    focal = 0.55 * w  # wide FOV so the up-facing sliver face appears
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    # camera inside, looking along +x with up +z: the +z face's lattice
    # (b, c) = (x, y) has its c axis along image x -> y-solve singular
    pose = look_at(
        np.array([0.14, 0.02, 0.06]),
        np.array([0.9, 0.1, 0.35]),
        np.array([0.0, 0.0, 1.0]),
    ).astype(np.float64)
    dom, pos, faces, dir_w = pixel_faces(pose, K, (w, h))
    picks = {}
    for a, p in faces:
        c_ax = [d for d in range(3) if d != a][1]
        m = (dom == a) & (pos == p)
        sc = dir_w[..., c_ax][m] / dir_w[..., a][m]
        picks[(a, p)] = _matmul_solve_choice(
            np.asarray(pose), a, float(sc.min()) - 0.02,
            float(sc.max()) + 0.02,
        )
    assert (2, True) in picks and picks[(2, True)] != "matmul", picks
    out = render_swr_inside(
        params, grid, cfg, pose, K, (w, h), n_chunks=8
    )
    ref = render_swr_inside(
        params, grid, cfg, pose, K, (w, h), n_chunks=8, warp="gather"
    )
    got, want = np.asarray(out["rgb"]), np.asarray(ref["rgb"])
    assert np.isfinite(got).all()
    mse = float(np.mean((got - want) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 35.0, f"singular-face warp mismatch: psnr={psnr:.2f}"
    # and no opacity hole on the sliver face's pixels
    op = np.asarray(out["opacity"]).reshape(h, w)
    m = (dom == 2) & pos
    assert op[m].min() > 0.5, f"opacity hole: {op[m].min()}"


def test_face_slope_bounds_cover_face_pixels():
    """face_slope_bounds (host helper used by the inside-camera trainer)
    must cover the true (d_b/d_a, d_c/d_a) slopes of every pixel the face
    owns — an undershot bound clips real geometry out of the training
    render.  Interior ends carry a +pad margin; ends that reach the
    dominance boundary extend to the full cone (+-1.05)."""
    from taichi_nerfs_tpu.render.swr import face_slope_bounds, pixel_faces

    w = h = 48
    K = np.array(
        [[0.7 * w, 0, w / 2], [0, 0.7 * h, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.05, -0.1, 0.12]),
        np.array([0.8, 0.3, -0.2]),
        np.array([0.0, 0.0, 1.0]),
    ).astype(np.float64)
    dom, pos, faces, dir_w = pixel_faces(pose, K, (w, h))
    assert len(faces) >= 2  # oblique view: several faces share the image
    for a, p in faces:
        b = face_slope_bounds(
            pose, K, (w, h), a, 1.0 if p else -1.0, n_grid=33
        )
        assert b is not None
        m = (dom == a) & (pos == p)
        b_ax, c_ax = [d for d in range(3) if d != a]
        da = dir_w[..., a][m]
        for row, ax in enumerate((b_ax, c_ax)):
            sl = dir_w[..., ax][m] / da
            lo, hi = float(b[row, 0]), float(b[row, 1])
            assert lo <= sl.min() + 1e-5, (a, p, row, lo, sl.min())
            assert hi >= sl.max() - 1e-5, (a, p, row, hi, sl.max())
            # never wider than the full dominance cone + margin
            assert lo >= -1.05 - 1e-6 and hi <= 1.05 + 1e-6


def test_face_slope_bounds_empty_face():
    """A face with no pixels in the crop returns None."""
    from taichi_nerfs_tpu.render.swr import face_slope_bounds

    w = h = 32
    K = np.array(
        [[2.0 * w, 0, w / 2], [0, 2.0 * h, h / 2], [0, 0, 1]], np.float32
    )
    # narrow FOV looking along +x: the -x face owns nothing
    pose = look_at(
        np.zeros(3), np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    assert face_slope_bounds(pose, K, (w, h), 0, -1.0) is None


def test_swr_lat_cap_quality(setup):
    """Lattice-cap fidelity pin (VERDICT r1 weak-item 5): the capped
    render (lat_size ~ 1.25 R, what the interactive viewer and the fps
    numbers in docs/shear_warp.md use) must agree with the uncapped
    render to high PSNR for grid-band-limited content — the lattice only
    needs to resolve the R-cell grid, the final warp magnifies.

    Measured context on the crisp lego-proxy at 800^2 (R=256, 8k-step
    checkpoint): capped 26.34 dB vs uncapped 28.12 dB eval PSNR — the
    cap is a speed/quality knob, so quality evals (train.py's eval loop)
    render uncapped and only the interactive path keeps the cap."""
    cfg, params, grid = setup
    w = h = 128
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.4, 0.9, -1.1]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    cap = int(1.25 * cfg.grid_res) + 16
    out_cap = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8, lat_cap=cap
    )
    out_full = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8
    )
    a = np.asarray(out_cap["rgb"])
    b = np.asarray(out_full["rgb"])
    mse = float(np.mean((a - b) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 30.0, f"lat-capped render diverges: psnr={psnr:.2f}"


def _grazing_pose_setup(w=64, h=64):
    """Pose class behind the round-3 TPU NaN eval view: a wide-fov
    camera whose sweep axis is only barely dominant, so edge pixels'
    ray direction component along the sweep axis crosses ~0 (grazing).
    The final warp divides by that component (render/swr.py t_hit);
    before the guard, bf16 matmul rounding on TPU turned it into exactly
    0 and one view rendered NaN (docs/status_r3.md:100-102)."""
    # axis-1 component barely beats axis-2: the view cone spans da = 0
    eye = 1.3 * np.array([0.0, 0.7072, 0.7070])
    pose = look_at(
        eye, np.zeros(3), np.array([1.0, 0.0, 0.0])
    ).astype(np.float64)
    focal = 0.45 * w  # half-fov ~48 deg; corners ~58 deg off-center
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    # verify the pose class analytically: some pixel's |d_axis| ~ 0
    axis = int(np.argmax(np.abs(pose[:, 2])))
    uu, vv = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dc = np.stack(
        [
            (uu.ravel() - K[0, 2] + 0.5) / K[0, 0],
            (vv.ravel() - K[1, 2] + 0.5) / K[1, 1],
            np.ones(w * h),
        ],
        axis=1,
    )
    da = (dc @ pose[:, :3].T)[:, axis]
    assert np.min(np.abs(da)) < 2e-2, "pose no longer grazing"
    assert np.min(da) < 0 < np.max(da), "da must cross zero in-view"
    return pose, K, (w, h)


def test_swr_grazing_pose_finite(setup):
    """Regression (round-3 verdict item 2): grazing-pixel poses must
    render finite everywhere, with the degenerate pixels composited to
    background rather than NaN — AND the non-grazing pixels must still
    show the scene at every resolution.  The first round-4 fix clipped
    the frame slope bounds to +-4, which silently blacked out the whole
    view for lattices >= ~96 (large slopes are legitimate geometry: a
    wide-fov barely-dominant-axis view needs a frame many cube-widths
    wide); this test renders at two sizes and pins an opacity floor so
    a frame that stops covering the frustum fails loudly."""
    cfg, params, grid = setup
    for w in (64, 128):
        pose, K, wh = _grazing_pose_setup(w, w)
        out = render_swr(params, grid, cfg, pose, K, wh, n_chunks=8)
        for k in ("rgb", "depth", "opacity"):
            arr = np.asarray(out[k])
            assert np.all(np.isfinite(arr)), (
                f"{w}: {k} has non-finite values"
            )
        # non-grazing central pixels still see the blob (r3 parity:
        # this pose renders max opacity ~0.85 at 64, ~0.93 at 128)
        assert float(np.max(np.asarray(out["opacity"]))) > 0.5, w


def test_swr_early_exit_matches():
    """Chunk-level early termination (reference test-path T_threshold
    kill, modules/volume_render_test.py:23-49): with an opaque blob the
    early-exit render must match the full sweep to within the dropped
    transmittance tail (<= threshold), on both sweep impls."""
    cfg = pyr.PyramidConfig(
        resolutions=(16, 32), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0, deferred=True,
    )
    key = jax.random.PRNGKey(0)
    params = pyr.init_pyramid_params(key, cfg)
    R = cfg.grid_res
    c = (jnp.arange(R) + 0.5) / R - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx**2 + yy**2 + zz**2)
    # opaque core so rays saturate early and chunks actually get cut
    blob = 500.0 * jnp.exp(-((r / 0.25) ** 2))
    params["levels"][1] = params["levels"][1].at[..., 0].add(blob)
    grid = pyr.bake(params, cfg)
    w = h = 48
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.3, 0.8, -1.2]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    for impl in ("xla", "pallas_interpret"):
        full = render_swr(
            params, grid, cfg, pose, K, (w, h), n_chunks=8,
            sweep_impl=impl,
        )
        fast = render_swr(
            params, grid, cfg, pose, K, (w, h), n_chunks=8,
            sweep_impl=impl, early_exit=1e-4,
        )
        for k in ("rgb", "opacity"):
            np.testing.assert_allclose(
                np.asarray(fast[k]), np.asarray(full[k]),
                atol=2e-4, err_msg=f"{impl}:{k}",
            )
        assert float(np.max(np.asarray(fast["opacity"]))) > 0.9


def test_swr_perchunk_pallas_fallback_matches(monkeypatch):
    """Big-lattice dispatch: when the batched chunk-grid kernel would
    exceed the VMEM budget (measured OOM at F=16, nq=816 on v5e), the
    sweep falls back to one kernel launch per chunk inside a scan —
    results must match the batched call exactly.  Forced here by
    shrinking the module budget so CPU-size renders take the fallback."""
    from taichi_nerfs_tpu.render import swr as swr_mod

    cfg = pyr.PyramidConfig(
        resolutions=(16, 32), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0, deferred=True,
    )
    key = jax.random.PRNGKey(0)
    params = pyr.init_pyramid_params(key, cfg)
    R = cfg.grid_res
    c = (jnp.arange(R) + 0.5) / R - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx**2 + yy**2 + zz**2)
    params["levels"][1] = params["levels"][1].at[..., 0].add(
        2.0 * jnp.exp(-((r / 0.25) ** 2))
    )
    grid = pyr.bake(params, cfg)
    w = h = 48
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.3, 0.8, -1.2]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    ).astype(np.float64)
    batched = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8,
        sweep_impl="pallas_interpret",
    )
    # at nq=64/F=4: chunked estimate ~197K, batched ~295K — a 250K
    # budget forces exactly the per-chunk fallback.  The limit is read
    # at trace time, so drop the jit cache to force a re-trace.
    monkeypatch.setattr(swr_mod, "_PALLAS_VMEM_LIMIT", 250_000)
    swr_mod.render_swr_fixed_axis.clear_cache()
    perchunk = render_swr(
        params, grid, cfg, pose, K, (w, h), n_chunks=8,
        sweep_impl="pallas_interpret",
    )
    swr_mod.render_swr_fixed_axis.clear_cache()  # don't poison later tests
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(
            np.asarray(perchunk[k]), np.asarray(batched[k]),
            atol=1e-5, err_msg=k,
        )


def test_pyramid_lean_fine_level():
    """A lean finest level (level_features) bakes exactly like a full
    level whose trailing channels are zero, and trains (has grads)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from taichi_nerfs_tpu.models import pyramid as pyr

    cfg = pyr.PyramidConfig(
        resolutions=(4, 8), features=4, rgb_width=8, rgb_depth=1,
        level_features=(4, 2),
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
    assert params["levels"][1].shape == (8, 8, 8, 2)

    cfg_full = dataclasses.replace(cfg, level_features=())
    params_full = dict(params)
    fine = params["levels"][1]
    params_full["levels"] = [
        params["levels"][0],
        jnp.concatenate(
            [fine, jnp.zeros(fine.shape[:-1] + (2,), fine.dtype)], axis=-1
        ),
    ]
    np.testing.assert_allclose(
        np.asarray(pyr.bake(params, cfg)),
        np.asarray(pyr.bake(params_full, cfg_full)),
        rtol=1e-6,
    )

    def loss(p):
        return jnp.sum(pyr.bake(p, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert g["levels"][1].shape == (8, 8, 8, 2)
    assert float(jnp.abs(g["levels"][1]).max()) > 0

    # truncate slices level_features with resolutions
    t = pyr.truncate(cfg, 1)
    assert t.level_features == (4,)
