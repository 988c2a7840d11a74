"""Procedural synthetic scene — the framework's built-in test oracle.

The reference repo ships no automated tests and relies on the NSVF Lego
download (SURVEY §4); this module generates a tiny analytic scene (a soft
solid sphere with position-dependent albedo) and renders ground-truth images
with a *direct dense integrator* that shares no code with the production
marching/compositing path.  Used by the test-suite and the self-contained
benchmark when no dataset is on disk.

The analytic fields are written against a pluggable array module (``xp`` =
numpy or jax.numpy): the oracle default is plain numpy; large image sets
(quality sweeps at 800^2) use the device-vectorized jax integrator — the
same formulas, still independent of the production renderer — plus a disk
cache keyed by the scene parameters.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from .base import BaseDataset


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Camera-to-world with [right down front] axes (OpenCV convention)."""
    front = target - eye
    front = front / np.linalg.norm(front)
    right = np.cross(front, up)
    right = right / np.linalg.norm(right)
    down = np.cross(front, right)
    return np.stack([right, down, front, eye], axis=1).astype(np.float32)


def sphere_density(xyz, radius: float = 0.3, sharp: float = 40.0, xp=np):
    r = xp.linalg.norm(xyz, axis=-1)
    arg = xp.minimum(sharp * (r - radius), 80.0)
    return 20.0 / (1.0 + xp.exp(arg))


def sphere_albedo(xyz, xp=np):
    return xp.clip(xyz + 0.5, 0.0, 1.0)


def checker_density(xyz, radius: float = 0.32, xp=np):
    """Bumpy solid — the surface radius is modulated so fine grid levels
    carry real signal (the plain sphere is too smooth to discriminate
    encoder quality)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    bump = 0.04 * xp.sin(17.0 * x) * xp.sin(19.0 * y) * xp.sin(23.0 * z)
    r = xp.sqrt(x * x + y * y + z * z)
    # clamp the logit: exp overflows fp32 past ~88 (result is 0 anyway)
    arg = xp.minimum(80.0 * (r - (radius + bump)), 80.0)
    return 40.0 / (1.0 + xp.exp(arg))


def checker_albedo(xyz, xp=np):
    """High-frequency 3D texture (~0.08-unit period at the surface)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = 0.5 + 0.5 * xp.sin(40.0 * x) * xp.sin(40.0 * y)
    g = 0.5 + 0.5 * xp.sin(40.0 * y) * xp.sin(40.0 * z)
    b = 0.5 + 0.5 * xp.sin(40.0 * z) * xp.sin(40.0 * x)
    return xp.stack([r, g, b], axis=-1)


def shell_density(xyz, r_mid: float = 0.39, half: float = 0.05, xp=np):
    """Hollow spherical shell — the inside-camera test scene (cameras sit
    in the empty core and look outward, the dense path's cubemap-face
    sweep regime)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    bump = 0.02 * xp.sin(17.0 * x) * xp.sin(19.0 * y) * xp.sin(23.0 * z)
    r = xp.sqrt(x * x + y * y + z * z)
    arg = xp.minimum(80.0 * (xp.abs(r - r_mid) - (half + bump)), 80.0)
    return 40.0 / (1.0 + xp.exp(arg))


_VARIANTS = {
    "sphere": (sphere_density, sphere_albedo),
    "checker": (checker_density, checker_albedo),
    "shell": (shell_density, checker_albedo),
}


def _gt_rays(c2w: np.ndarray, K: np.ndarray, w: int, h: int):
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    dirs_cam = np.stack(
        [
            (u - K[0, 2] + 0.5) / K[0, 0],
            (v - K[1, 2] + 0.5) / K[1, 1],
            np.ones_like(u, dtype=np.float64),
        ],
        axis=-1,
    ).reshape(-1, 3)
    rays_d = dirs_cam @ c2w[:, :3].T
    rays_o = np.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o, rays_d


def render_gt_image(
    c2w: np.ndarray,
    K: np.ndarray,
    w: int,
    h: int,
    n_steps: int = 256,
    scale: float = 0.5,
    white_bg: bool = True,
    variant: str = "sphere",
) -> np.ndarray:
    """Dense (unaccelerated) volume integration oracle (pure numpy)."""
    rays_o, rays_d = _gt_rays(c2w, K, w, h)

    t0, t1 = 0.1, 2.5
    ts = np.linspace(t0, t1, n_steps, dtype=np.float32)
    dt = float(ts[1] - ts[0])
    density_fn, albedo_fn = _VARIANTS[variant]
    n = rays_d.shape[0]
    rgb = np.empty((n, 3), np.float32)
    # chunk over rays: the (R, S, 3) temporaries at full-image size are
    # ~0.5 GB at 256^2x512 and thrash the page cache
    chunk = max(1, (1 << 22) // n_steps)
    for i in range(0, n, chunk):
        xyz = (
            rays_o[i : i + chunk, None, :].astype(np.float32)
            + ts[None, :, None]
            * rays_d[i : i + chunk, None, :].astype(np.float32)
        )  # (r, S, 3)
        inside = np.all(np.abs(xyz) <= scale, axis=-1)
        sigma = density_fn(xyz) * inside
        alpha = 1.0 - np.exp(-sigma * dt)
        trans = np.cumprod(1.0 - alpha + 1e-12, axis=1) / (
            1.0 - alpha + 1e-12
        )
        wgt = alpha * trans  # (r, S)
        out = np.einsum("rs,rsc->rc", wgt, albedo_fn(xyz))
        if white_bg:
            out += trans[:, -1:] * (1.0 - alpha[:, -1:])
        rgb[i : i + chunk] = out
    return rgb.reshape(h * w, 3)


def render_gt_image_jax(
    c2w: np.ndarray,
    K: np.ndarray,
    w: int,
    h: int,
    n_steps: int = 256,
    scale: float = 0.5,
    white_bg: bool = True,
    variant: str = "sphere",
    chunk: int = 65536,
) -> np.ndarray:
    """Same direct integrator, vectorized with jax (device-accelerated).

    Only this container's single host core runs numpy; 800^2 x 512-step
    ground truth takes ~1 min/image there vs ~10 ms on the chip.  The
    formulas are shared with the numpy oracle via the ``xp`` parameter —
    still zero overlap with the production marching/compositing path.
    """
    import jax
    import jax.numpy as jnp

    rays_o, rays_d = _gt_rays(c2w, K, w, h)
    density_fn, albedo_fn = _VARIANTS[variant]
    t0, t1 = 0.1, 2.5
    ts = jnp.linspace(t0, t1, n_steps, dtype=jnp.float32)
    dt = float((t1 - t0) / (n_steps - 1))

    @jax.jit
    def integrate(ro, rd):
        xyz = (
            ro[:, None, :] + ts[None, :, None] * rd[:, None, :]
        )  # (r, S, 3)
        inside = jnp.all(jnp.abs(xyz) <= scale, axis=-1)
        sigma = density_fn(xyz, xp=jnp) * inside
        alpha = 1.0 - jnp.exp(-sigma * dt)
        trans = jnp.cumprod(1.0 - alpha + 1e-12, axis=1) / (
            1.0 - alpha + 1e-12
        )
        wgt = alpha * trans
        out = jnp.einsum("rs,rsc->rc", wgt, albedo_fn(xyz, xp=jnp))
        if white_bg:
            out += trans[:, -1:] * (1.0 - alpha[:, -1:])
        return out

    n = rays_d.shape[0]
    pad = (-n) % chunk
    ro = np.concatenate(
        [rays_o, np.zeros((pad, 3))], axis=0
    ).astype(np.float32)
    rd = np.concatenate(
        [rays_d, np.ones((pad, 3))], axis=0
    ).astype(np.float32)
    outs = [
        np.asarray(integrate(ro[i : i + chunk], rd[i : i + chunk]))
        for i in range(0, n + pad, chunk)
    ]
    return np.concatenate(outs, axis=0)[:n].reshape(h * w, 3)


class SyntheticSphereDataset(BaseDataset):
    """Drop-in dataset (same interface as NSVF/NeRF loaders)."""

    def __init__(
        self,
        root_dir: str = "",
        split: str = "train",
        downsample: float = 1.0,
        n_images: int = 12,
        img_wh=(64, 64),
        cam_radius: float = 1.2,
        variant: str = "sphere",
        n_steps: int = 256,
        gt_backend: str = "auto",
        cache_dir: str = "/tmp/tnerf_gt_cache",
        **kwargs,
    ):
        super().__init__(root_dir, split, downsample)
        self.variant = variant
        w, h = img_wh
        focal = 0.9 * w
        self.K = np.array(
            [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
        )
        self.img_wh = (w, h)

        if gt_backend == "auto":
            gt_backend = "jax" if w * h >= 256 * 256 else "numpy"
        render = (
            render_gt_image_jax if gt_backend == "jax" else render_gt_image
        )

        # shell rigs put the camera in the hollow core looking outward
        inside_rig = variant == "shell"
        if inside_rig and cam_radius >= 0.25:
            cam_radius = 0.15
        key = (
            f"v1|{split}|{n_images}|{w}x{h}|{cam_radius}|{variant}|"
            f"{n_steps}"
        )
        cache = os.path.join(
            cache_dir, hashlib.sha1(key.encode()).hexdigest()[:16] + ".npz"
        )
        if os.path.exists(cache):
            d = np.load(cache)
            self.poses, self.rays = d["poses"], d["rays"]
            self._set_directions()
            return

        rng = np.random.RandomState(0 if split == "train" else 1)
        poses, rays = [], []
        for i in range(n_images):
            theta = 2 * np.pi * i / n_images + rng.uniform(0, 0.3)
            phi = rng.uniform(-0.9, 0.9)
            eye = cam_radius * np.array(
                [
                    np.cos(theta) * np.cos(phi),
                    np.sin(theta) * np.cos(phi),
                    np.sin(phi),
                ]
            )
            target = 4.0 * eye if inside_rig else np.zeros(3)
            c2w = look_at(eye, target, np.array([0.0, 0.0, 1.0]))
            poses.append(c2w)
            rays.append(
                render(c2w, self.K, w, h, n_steps=n_steps, variant=variant)
            )
        self.poses = np.stack(poses)
        self.rays = np.stack(rays)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez(cache, poses=self.poses, rays=self.rays)
        except OSError:
            pass
        self._set_directions()
