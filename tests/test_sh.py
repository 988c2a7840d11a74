"""SH encoding tests: orthonormality (independent analytic property)."""

import jax.numpy as jnp
import numpy as np

from taichi_nerfs_tpu.ops.sh import eval_sh, sh_encode


def _fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [
            np.cos(theta) * np.sin(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(phi),
        ],
        axis=-1,
    )


def test_sh_orthonormal():
    """Real SH basis satisfies (1/4pi) * 4pi * <Y_i Y_j> = delta_ij."""
    dirs = _fibonacci_sphere(200000).astype(np.float32)
    Y = np.asarray(sh_encode(jnp.asarray(dirs)), np.float64)
    gram = (Y.T @ Y) * (4 * np.pi / len(dirs))
    np.testing.assert_allclose(gram, np.eye(16), atol=2e-2)


def test_sh_constant_term():
    d = jnp.asarray([[0.3, -0.5, 0.81]])
    enc = np.asarray(sh_encode(d))
    assert np.isclose(enc[0, 0], 0.28209479177387814)


def test_eval_sh_matches_encode_on_deg2():
    """eval_sh with a one-hot coefficient reproduces the basis function
    (up to the sign conventions shared by both implementations)."""
    dirs = _fibonacci_sphere(64).astype(np.float32)
    enc = np.asarray(sh_encode(jnp.asarray(dirs)))
    for i in range(9):
        sh = np.zeros((64, 9), np.float32)
        sh[:, i] = 1.0
        vals = np.asarray(eval_sh(2, jnp.asarray(sh), jnp.asarray(dirs)))
        np.testing.assert_allclose(vals, enc[:, i], rtol=1e-4, atol=1e-5)
