"""Ray generation, pose utilities, and ray/AABB intersection — pure JAX/numpy.

TPU-native rebuild of ``datasets/ray_utils.py`` (ray directions / world rays /
pose centering / spheric trajectories) and of the Taichi slab-test kernel
``modules/intersection.py:8-55``.  Everything is vectorized, fp32, and
jit-friendly; pose preprocessing helpers stay in numpy (host-side, one-time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NEAR_DISTANCE


# ---------------------------------------------------------------------------
# ray generation (reference: datasets/ray_utils.py:8-80)
# ---------------------------------------------------------------------------


def get_ray_directions(
    H: int,
    W: int,
    K,
    random: bool = False,
    key: jax.Array | None = None,
    flatten: bool = True,
    return_uv: bool = False,
):
    """Per-pixel ray directions in the camera frame [right down front].

    Reference: ``datasets/ray_utils.py:8-48``.  Deterministic rays pass
    through pixel centers (+0.5 offsets).
    """
    K = jnp.asarray(K, jnp.float32)
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    u, v = jnp.meshgrid(u, v, indexing="xy")  # (H, W)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if random:
        if key is None:
            raise ValueError("random=True requires a PRNG key")
        ku, kv = jax.random.split(key)
        du = jax.random.uniform(ku, u.shape)
        dv = jax.random.uniform(kv, v.shape)
    else:
        du = dv = 0.5
    directions = jnp.stack(
        [(u - cx + du) / fx, (v - cy + dv) / fy, jnp.ones_like(u)], axis=-1
    )
    uv = jnp.stack([u, v], axis=-1)
    if flatten:
        directions = directions.reshape(-1, 3)
        uv = uv.reshape(-1, 2)
    if return_uv:
        return directions, uv
    return directions


def get_ray_directions_np(H: int, W: int, K) -> np.ndarray:
    """Numpy twin of :func:`get_ray_directions` (deterministic, flattened)
    for host-side dataset preprocessing — no device round-trip."""
    K = np.asarray(K, np.float32)
    u, v = np.meshgrid(
        np.arange(W, dtype=np.float32),
        np.arange(H, dtype=np.float32),
        indexing="xy",
    )
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    directions = np.stack(
        [(u - cx + 0.5) / fx, (v - cy + 0.5) / fy, np.ones_like(u)], axis=-1
    )
    return directions.reshape(-1, 3).astype(np.float32)


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Camera-frame directions + camera-to-world pose(s) -> world rays.

    Args:
        directions: (N, 3) camera-frame directions.
        c2w: (3, 4) single pose or (N, 3, 4) per-ray poses.
    Returns:
        rays_o, rays_d: (N, 3) world-space origins and (unnormalized)
        directions.  Reference: ``datasets/ray_utils.py:51-80``.
    """
    directions = jnp.asarray(directions, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    # full fp32 — the reference pins ray math to fp32 under AMP
    # (datasets/ray_utils.py:7,50)
    if c2w.ndim == 2:
        rays_d = jnp.matmul(
            directions, c2w[:, :3].T, precision=jax.lax.Precision.HIGHEST
        )
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum(
            "nc,nbc->nb",
            directions,
            c2w[..., :3],
            precision=jax.lax.Precision.HIGHEST,
        )
        rays_o = c2w[..., 3]
    return rays_o, rays_d


def axisangle_to_R(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix (reference: datasets/ray_utils.py:84-110)."""
    single = v.ndim == 1
    v = jnp.atleast_2d(v)
    zero = jnp.zeros_like(v[:, :1])
    skew_v0 = jnp.concatenate([zero, -v[:, 2:3], v[:, 1:2]], 1)
    skew_v1 = jnp.concatenate([v[:, 2:3], zero, -v[:, 0:1]], 1)
    skew_v2 = jnp.concatenate([-v[:, 1:2], v[:, 0:1], zero], 1)
    skew_v = jnp.stack([skew_v0, skew_v1, skew_v2], axis=1)
    norm_v = (jnp.linalg.norm(v, axis=1) + 1e-7)[:, None, None]
    eye = jnp.eye(3, dtype=v.dtype)
    R = (
        eye
        + (jnp.sin(norm_v) / norm_v) * skew_v
        + ((1 - jnp.cos(norm_v)) / norm_v**2) * (skew_v @ skew_v)
    )
    return R[0] if single else R


# ---------------------------------------------------------------------------
# ray / AABB intersection (reference: modules/intersection.py:8-55)
# ---------------------------------------------------------------------------


def ray_aabb_intersect(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Slab test against the [-scale, scale]^3 cube.

    Returns:
        hits_t: (N, 2) — (max(t1, NEAR_DISTANCE), t2) on hit, (-1, -1) miss.
    """
    inv_d = 1.0 / rays_d
    t_min = (-scale - rays_o) * inv_d
    t_max = (scale - rays_o) * inv_d
    t1 = jnp.max(jnp.minimum(t_min, t_max), axis=-1)
    t2 = jnp.min(jnp.maximum(t_min, t_max), axis=-1)
    hit = t2 > 0.0
    near = jnp.maximum(t1, NEAR_DISTANCE)
    return jnp.where(
        hit[:, None],
        jnp.stack([near, t2], axis=-1),
        jnp.full((rays_o.shape[0], 2), -1.0, rays_o.dtype),
    )


# ---------------------------------------------------------------------------
# pose preprocessing (host-side numpy; reference: datasets/ray_utils.py:113-221)
# ---------------------------------------------------------------------------


def normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def average_poses(poses: np.ndarray, pts3d: np.ndarray | None = None):
    """Average pose used for centering (reference: ray_utils.py:118-157)."""
    center = pts3d.mean(0) if pts3d is not None else poses[..., 3].mean(0)
    z = normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses: np.ndarray, pts3d: np.ndarray | None = None):
    """Recenter poses (and points) about the average pose.

    Reference: ``datasets/ray_utils.py:160-190``.
    """
    pose_avg = average_poses(poses, pts3d)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    pose_avg_inv = np.linalg.inv(pose_avg_homo)
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    poses_centered = (pose_avg_inv @ poses_homo)[:, :3]
    if pts3d is not None:
        pts3d_centered = pts3d @ pose_avg_inv[:3, :3].T + pose_avg_inv[:3, 3]
        return poses_centered, pts3d_centered
    return poses_centered


def create_spheric_poses(radius: float, mean_h: float, n_poses: int = 120):
    """Circular test trajectory (reference: datasets/ray_utils.py:193-221)."""

    def spheric_pose(theta, phi, radius):
        trans_t = lambda t: np.array(
            [[1, 0, 0, 0], [0, 1, 0, 2 * mean_h], [0, 0, 1, -t]], dtype=float
        )
        rot_phi = lambda phi: np.array(
            [
                [1, 0, 0],
                [0, np.cos(phi), -np.sin(phi)],
                [0, np.sin(phi), np.cos(phi)],
            ]
        )
        rot_theta = lambda th: np.array(
            [
                [np.cos(th), 0, -np.sin(th)],
                [0, 1, 0],
                [np.sin(th), 0, np.cos(th)],
            ]
        )
        c2w = rot_theta(theta) @ rot_phi(phi) @ trans_t(radius)
        return np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=float) @ c2w

    return np.stack(
        [
            spheric_pose(th, -np.pi / 12, radius)
            for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]
        ],
        0,
    )
