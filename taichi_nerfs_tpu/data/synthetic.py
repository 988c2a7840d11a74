"""Procedural synthetic scene — the framework's built-in test oracle.

The reference repo ships no automated tests and relies on the NSVF Lego
download (SURVEY §4); this module generates a tiny analytic scene (a soft
solid sphere with position-dependent albedo) and renders ground-truth images
with a *direct dense integrator* that shares no code with the production
marching/compositing path.  Used by the test-suite and the self-contained
benchmark when no dataset is on disk.
"""

from __future__ import annotations

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


def sphere_density(xyz: np.ndarray, radius: float = 0.3, sharp: float = 40.0):
    r = np.linalg.norm(xyz, axis=-1)
    return 20.0 / (1.0 + np.exp(sharp * (r - radius)))


def sphere_albedo(xyz: np.ndarray) -> np.ndarray:
    return np.clip(xyz + 0.5, 0.0, 1.0)


def checker_density(xyz: np.ndarray, radius: float = 0.32):
    """Bumpy solid — the surface radius is modulated so fine grid levels
    carry real signal (the plain sphere is too smooth to discriminate
    encoder quality)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    bump = 0.04 * np.sin(17.0 * x) * np.sin(19.0 * y) * np.sin(23.0 * z)
    r = np.sqrt(x * x + y * y + z * z)
    return 40.0 / (1.0 + np.exp(80.0 * (r - (radius + bump))))


def checker_albedo(xyz: np.ndarray) -> np.ndarray:
    """High-frequency 3D texture (~0.08-unit period at the surface)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = 0.5 + 0.5 * np.sin(40.0 * x) * np.sin(40.0 * y)
    g = 0.5 + 0.5 * np.sin(40.0 * y) * np.sin(40.0 * z)
    b = 0.5 + 0.5 * np.sin(40.0 * z) * np.sin(40.0 * x)
    return np.stack([r, g, b], axis=-1)


_VARIANTS = {
    "sphere": (sphere_density, sphere_albedo),
    "checker": (checker_density, checker_albedo),
}


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
    """Dense (unaccelerated) volume integration oracle."""
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
            c2w = look_at(eye, np.zeros(3), np.array([0.0, 0.0, 1.0]))
            poses.append(c2w)
            rays.append(
                render_gt_image(
                    c2w, self.K, w, h, n_steps=n_steps, variant=variant
                )
            )
        self.poses = np.stack(poses)
        self.rays = np.stack(rays)
        self._set_directions()
