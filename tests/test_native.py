"""Native (C++) deployment runner: export -> load -> parity with Python.

The counterpart of the reference's empirical mobile-app check: we verify the
tagged-binary round trip, the C++ field eval against the JAX model, and a
full C++ frame render against the JAX test-time renderer.
"""

import ctypes
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_nerfs_tpu.models.ngp import forward as ngp_forward
from taichi_nerfs_tpu.models.ngp import init_ngp_params
from taichi_nerfs_tpu.models.occupancy import init_occupancy
from taichi_nerfs_tpu.ops.math import packbits_u32
from taichi_nerfs_tpu.utils.export import (
    export_native,
    load_tagged_binary,
    save_tagged_binary,
)

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def _build_native():
    """cmake+ninja (incremental — always run so binaries never go stale)."""
    if not os.path.exists(os.path.join(NATIVE_DIR, "build")):
        subprocess.run(
            ["cmake", "-B", "build", "-G", "Ninja"], cwd=NATIVE_DIR,
            check=True, capture_output=True,
        )
    subprocess.run(
        ["ninja", "-C", "build"], cwd=NATIVE_DIR, check=True,
        capture_output=True,
    )


@pytest.fixture(scope="module")
def native_lib():
    _build_native()
    lib = os.path.join(NATIVE_DIR, "build", "libtnerf_c.so")
    so = ctypes.CDLL(lib)
    so.tnerf_load.restype = ctypes.c_void_p
    so.tnerf_load.argtypes = [ctypes.c_char_p]
    so.tnerf_eval.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_float)
    ] * 3
    so.tnerf_render.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    so.tnerf_image_size.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    return so


def test_tagged_binary_roundtrip(tmp_path):
    for arr in (
        np.arange(7, dtype=np.float32),
        np.arange(5, dtype=np.uint32),
        np.float16([1.5, -2.25, 0.0, 65504.0]),
    ):
        p = str(tmp_path / "t.bin")
        save_tagged_binary(p, arr)
        back = load_tagged_binary(p)
        assert back.dtype == arr.dtype
        np.testing.assert_array_equal(back, arr)


@pytest.fixture(scope="module")
def exported(tmp_path_factory, native_lib):
    # small hash-encoder model on an everything-occupied grid
    from tests.conftest import Config  # noqa: F401

    from taichi_nerfs_tpu.config import (
        HashGridConfig,
        ModelConfig,
        RenderConfig,
    )

    cfg = ModelConfig(
        scale=0.5,
        pos_encoder_type="hash",
        grid=HashGridConfig(
            levels=4, feature_per_level=2, log2_T=11, base_res=4, max_res=32
        ),
        grid_size=32,
        xyz_net_width=16,
        rgb_net_width=16,
        mlp_dtype="float32",
    )
    rcfg = RenderConfig(
        exp_step_factor=0.0, t_threshold=1e-4, white_bg=True
    )
    params = init_ngp_params(jax.random.PRNGKey(5), cfg)
    occ = init_occupancy(cfg)
    bitfield = packbits_u32(jnp.ones_like(occ.density_grid.reshape(-1)), 0.5)

    w = h = 40
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    # camera at z=-1.4 looking at origin
    pose = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -1.4]], np.float32
    )
    out = str(tmp_path_factory.mktemp("export"))
    export_native(
        params,
        cfg,
        bitfield,
        pose[None],
        K,
        (w, h),
        out,
        render_cfg=rcfg,
        pose_index=0,
    )
    return out, params, cfg, rcfg, bitfield, pose, K, (w, h)


def test_native_field_eval_matches_jax(native_lib, exported):
    out_dir, params, cfg, *_ = exported
    handle = native_lib.tnerf_load(out_dir.encode())
    assert handle
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-0.45, 0.45, size=(32, 3)).astype(np.float32)
    dirs = rng.normal(size=(32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    sig_j, rgb_j = jax.jit(
        lambda p, x, d: ngp_forward(p, cfg, x, d)
    )(params, jnp.asarray(xyz), jnp.asarray(dirs))
    sig_j, rgb_j = np.asarray(sig_j), np.asarray(rgb_j)
    out = (ctypes.c_float * 4)()
    for i in range(len(xyz)):
        x = (ctypes.c_float * 3)(*xyz[i])
        d = (ctypes.c_float * 3)(*dirs[i])
        assert native_lib.tnerf_eval(handle, x, d, out) == 0
        # TPU default-precision matmuls truncate inputs to bf16; the C++
        # side is full fp32, so ~1e-2 relative slack is inherent
        np.testing.assert_allclose(out[0], sig_j[i], rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out[1:4]), rgb_j[i], rtol=1e-2, atol=1e-3
        )


def test_native_render_matches_jax(native_lib, exported):
    out_dir, params, cfg, rcfg, bitfield, pose, K, img_wh = exported
    from taichi_nerfs_tpu.config import Config as FullConfig
    from taichi_nerfs_tpu.ops.rays import get_ray_directions, get_rays
    from taichi_nerfs_tpu.render.renderer import render_image

    w, h = img_wh
    directions = get_ray_directions(h, w, jnp.asarray(K))
    rays_o, rays_d = get_rays(directions, jnp.asarray(pose))
    full_cfg = FullConfig(model=cfg, render=rcfg)
    jax_img = np.asarray(
        render_image(
            params, full_cfg, bitfield, rays_o, rays_d, chunk=2048
        )["rgb"]
    ).reshape(h, w, 3)

    handle = native_lib.tnerf_load(out_dir.encode())
    assert handle
    buf = (ctypes.c_float * (w * h * 3))()
    p = (ctypes.c_float * 12)(*pose.reshape(-1))
    assert native_lib.tnerf_render(handle, p, buf, 4) == 0
    native_img = np.ctypeslib.as_array(buf).reshape(h, w, 3)

    mse = float(np.mean((native_img - jax_img) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 30.0, f"native/jax render mismatch: psnr={psnr:.2f}"


@pytest.fixture(scope="module")
def runner_bin():
    _build_native()
    return os.path.join(NATIVE_DIR, "build", "tnerf_runner")


def _read_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        assert f.readline().strip() == b"255"
        data = np.frombuffer(f.read(w * h * 3), np.uint8)
    return data.reshape(h, w, 3).astype(np.float32) / 255.0


def test_native_pyramid_render_matches_jax(runner_bin, tmp_path):
    """Full deployment flow of the dense flagship: bake -> tagged export ->
    C++ runner frame vs the JAX shear-warp renderer."""
    from taichi_nerfs_tpu.data.synthetic import look_at
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr
    from taichi_nerfs_tpu.utils.export import export_pyramid_native

    cfg = pyr.PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0, deferred=True,
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
    R = cfg.grid_res
    c = (jnp.arange(R) + 0.5) / R - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    blob = 2.0 * jnp.exp(-((jnp.sqrt(xx**2 + yy**2 + zz**2) / 0.25) ** 2))
    params["levels"][1] = params["levels"][1].at[..., 0].add(blob)

    w = h = 48
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.2, 0.3, -1.3]), np.zeros(3), np.array([0.0, 0.0, 1.0])
    )
    out_dir = str(tmp_path / "pyr_export")
    export_pyramid_native(
        params, cfg, pose, K, (w, h), out_dir, grid_dtype=np.float32
    )

    ppm = str(tmp_path / "frame.ppm")
    res = subprocess.run(
        [runner_bin, out_dir, ppm, "--threads", "2"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    native_img = _read_ppm(ppm)

    grid = pyr.bake(params, cfg)
    jax_img = np.asarray(
        render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=4)["rgb"]
    ).reshape(h, w, 3)
    mse = float(np.mean((native_img - np.clip(jax_img, 0, 1)) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 25.0, f"native/jax pyramid mismatch: psnr={psnr:.2f}"


def test_native_pyramid_inside_camera_matches_jax(runner_bin, tmp_path):
    """Inside-the-grid camera: C++ runner frame vs the JAX cubemap-face
    renderer (render_swr_inside).  The native marcher clamps ray entry to
    t=0, so the same export renders from anywhere."""
    from taichi_nerfs_tpu.data.synthetic import look_at
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr_inside
    from taichi_nerfs_tpu.utils.export import export_pyramid_native

    cfg = pyr.PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0, deferred=True,
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
    # hollow shell of density: the camera sits in the empty core
    R = cfg.grid_res
    c = (jnp.arange(R) + 0.5) / R - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx**2 + yy**2 + zz**2)
    shell = 3.0 * jnp.exp(-(((r - 0.38) / 0.06) ** 2))
    params["levels"][1] = params["levels"][1].at[..., 0].add(shell)

    w = h = 48
    focal = 0.9 * w
    K = np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )
    pose = look_at(
        np.array([0.1, 0.05, -0.1]), np.array([0.5, 0.3, 0.2]),
        np.array([0.0, 0.0, 1.0]),
    )
    out_dir = str(tmp_path / "pyr_inside")
    export_pyramid_native(
        params, cfg, pose, K, (w, h), out_dir, grid_dtype=np.float32
    )
    ppm = str(tmp_path / "frame.ppm")
    res = subprocess.run(
        [runner_bin, out_dir, ppm, "--threads", "2"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    native_img = _read_ppm(ppm)

    grid = pyr.bake(params, cfg)
    jax_img = np.asarray(
        render_swr_inside(
            params, grid, cfg, pose, K, (w, h), n_chunks=4
        )["rgb"]
    ).reshape(h, w, 3)
    mse = float(np.mean((native_img - np.clip(jax_img, 0, 1)) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 22.0, f"native/jax inside mismatch: psnr={psnr:.2f}"
