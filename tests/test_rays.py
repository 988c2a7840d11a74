"""Ray generation and AABB intersection tests."""

import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.ops.rays import (
    get_ray_directions,
    get_rays,
    ray_aabb_intersect,
)


def test_ray_directions_center_pixel():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    dirs = np.asarray(get_ray_directions(48, 64, K, flatten=False))
    assert dirs.shape == (48, 64, 3)
    # the pixel whose center projects through the principal point
    d = dirs[23, 31]
    np.testing.assert_allclose(d, [-0.005, -0.005, 1.0], atol=1e-6)
    assert np.all(dirs[..., 2] == 1.0)


def test_get_rays_single_and_batched_poses():
    dirs = np.array([[0.0, 0.0, 1.0], [0.1, -0.2, 1.0]], np.float32)
    c2w = np.concatenate([np.eye(3), [[1], [2], [3]]], axis=1).astype(
        np.float32
    )
    o, d = get_rays(jnp.asarray(dirs), jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o), [[1, 2, 3], [1, 2, 3]])
    np.testing.assert_allclose(np.asarray(d), dirs, atol=1e-6)
    # batched poses path
    c2ws = np.stack([c2w, c2w])
    o2, d2 = get_rays(jnp.asarray(dirs), jnp.asarray(c2ws))
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-6)


def _aabb_oracle(o, d, scale, n=100000):
    """Brute-force: walk the ray and find entry/exit of the cube."""
    ts = np.linspace(0, 10, n)
    pts = o[None] + ts[:, None] * d[None]
    inside = np.all(np.abs(pts) <= scale, axis=-1)
    if not inside.any():
        return None
    return ts[inside][0], ts[inside][-1]


def test_aabb_intersect_matches_bruteforce(rng):
    scale = 0.5
    o = rng.uniform(-2, 2, size=(50, 3)).astype(np.float32)
    d = rng.normal(size=(50, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hits = np.asarray(ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), scale))
    for i in range(50):
        oracle = _aabb_oracle(o[i], d[i], scale)
        if hits[i, 0] < 0:
            # miss (or box behind the origin)
            assert oracle is None or oracle[1] <= 0 or hits[i, 1] <= 0
        else:
            if oracle is None:
                # grazing hit narrower than the oracle's step
                assert hits[i, 1] - hits[i, 0] < 1e-2
                continue
            t1, t2 = oracle
            assert abs(hits[i, 0] - max(t1, 0.01)) < 2e-3
            assert abs(hits[i, 1] - t2) < 2e-3


def test_aabb_inside_origin():
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hits = np.asarray(ray_aabb_intersect(o, d, 0.5))
    # origin inside the box: t1 clamps to NEAR_DISTANCE, t2 = 0.5
    np.testing.assert_allclose(hits[0], [0.01, 0.5], atol=1e-6)
