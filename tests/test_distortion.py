"""Distortion loss vs a scalar re-implementation of the reference kernels."""

import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from taichi_nerfs_tpu.ops.distortion import distortion_loss


def _oracle(ws, deltas, ts, counts):
    """Scalar loop replicating modules/distortion.py:15-84."""
    n, s = ws.shape
    loss = np.zeros(n)
    for r in range(n):
        ws_inc = wts_inc = 0.0
        for i in range(counts[r]):
            ws_exc, wts_exc = ws_inc, wts_inc
            ws_inc += ws[r, i]
            wts_inc += ws[r, i] * ts[r, i]
            loss[r] += (
                2 * (wts_inc * ws_exc - ws_inc * wts_exc)
                + ws[r, i] ** 2 * deltas[r, i] / 3
            )
    return loss


def test_distortion_matches_oracle(rng):
    n, s = 6, 12
    ws = rng.uniform(0, 0.3, (n, s)).astype(np.float32)
    deltas = rng.uniform(0.001, 0.01, (n, s)).astype(np.float32)
    ts = np.cumsum(deltas, 1).astype(np.float32) + 0.3
    counts = rng.randint(0, s + 1, n)
    valid = np.arange(s)[None] < counts[:, None]
    got = np.asarray(
        distortion_loss(
            jnp.asarray(ws), jnp.asarray(deltas), jnp.asarray(ts), jnp.asarray(valid)
        )
    )
    want = _oracle(ws, deltas, ts, counts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_distortion_zero_for_point_mass(rng):
    """A single-sample ray has (almost) zero distortion."""
    ws = jnp.asarray([[0.9, 0, 0, 0]])
    deltas = jnp.asarray([[1e-4, 1e-4, 1e-4, 1e-4]])
    ts = jnp.asarray([[0.5, 0.6, 0.7, 0.8]])
    valid = jnp.asarray([[True, False, False, False]])
    loss = float(distortion_loss(ws, deltas, ts, valid)[0])
    assert loss < 1e-4


def test_distortion_grads(rng):
    ws = jnp.asarray(rng.uniform(0, 0.3, (3, 8)).astype(np.float32))
    deltas = jnp.asarray(rng.uniform(0.001, 0.01, (3, 8)).astype(np.float32))
    ts = jnp.cumsum(deltas, 1) + 0.3
    valid = jnp.ones((3, 8), bool)

    def f(w):
        return jnp.sum(distortion_loss(w, deltas, ts, valid))

    check_grads(f, (ws,), order=1, modes=("rev",), rtol=0.1, atol=1e-2, eps=1e-2)
