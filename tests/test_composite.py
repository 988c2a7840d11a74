"""Compositing tests vs a scalar re-implementation of the reference kernel."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from taichi_nerfs_tpu.ops.composite import (
    apply_background,
    composite_test_round,
    composite_train,
)


def _oracle_composite(sigmas, rgbs, deltas, ts, counts, t_threshold, t_in=None):
    """Scalar loop replicating modules/volume_train.py:22-48."""
    n = sigmas.shape[0]
    opacity = np.zeros(n)
    depth = np.zeros(n)
    rgb = np.zeros((n, 3))
    ws = np.zeros_like(sigmas)
    vr = 0
    for r in range(n):
        T = 1.0 if t_in is None else t_in[r]
        for s in range(counts[r]):
            if T <= t_threshold:
                break
            a = 1.0 - np.exp(-sigmas[r, s] * deltas[r, s])
            w = a * T
            rgb[r] += w * rgbs[r, s]
            depth[r] += w * ts[r, s]
            opacity[r] += w
            ws[r, s] = w
            T = T * (1.0 - a)
            vr += 1
    return opacity, depth, rgb, ws, vr


def _random_inputs(rng, n=8, s=16):
    sigmas = rng.uniform(0, 50, (n, s)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (n, s, 3)).astype(np.float32)
    deltas = rng.uniform(0.001, 0.01, (n, s)).astype(np.float32)
    ts = np.cumsum(deltas, axis=1).astype(np.float32) + 0.5
    counts = rng.randint(0, s + 1, n)
    valid = np.arange(s)[None] < counts[:, None]
    return sigmas, rgbs, deltas, ts, counts, valid


def test_composite_matches_oracle(rng):
    sigmas, rgbs, deltas, ts, counts, valid = _random_inputs(rng)
    thr = 1e-4
    res = composite_train(
        jnp.asarray(sigmas),
        jnp.asarray(rgbs),
        jnp.asarray(deltas),
        jnp.asarray(ts),
        jnp.asarray(valid),
        thr,
    )
    o, d, c, w, vr = _oracle_composite(sigmas, rgbs, deltas, ts, counts, thr)
    np.testing.assert_allclose(np.asarray(res.opacity), o, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.depth), d, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.rgb), c, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res.ws), w, rtol=1e-3, atol=2e-5)
    assert int(res.vr_samples) == vr


def test_composite_early_stop(rng):
    """A huge sigma early on kills the rest of the ray."""
    n, s = 2, 10
    sigmas = np.full((n, s), 1e-3, np.float32)
    sigmas[:, 2] = 1e6
    rgbs = np.full((n, s, 3), 0.5, np.float32)
    deltas = np.full((n, s), 0.01, np.float32)
    ts = np.cumsum(deltas, 1).astype(np.float32)
    valid = np.ones((n, s), bool)
    res = composite_train(
        jnp.asarray(sigmas),
        jnp.asarray(rgbs),
        jnp.asarray(deltas),
        jnp.asarray(ts),
        jnp.asarray(valid),
        1e-4,
    )
    assert np.all(np.asarray(res.ws)[:, 3:] == 0.0)
    np.testing.assert_allclose(np.asarray(res.opacity), 1.0, atol=1e-4)


def test_composite_grads(rng):
    sigmas, rgbs, deltas, ts, counts, valid = _random_inputs(rng, n=4, s=8)

    def f(sg, rg):
        res = composite_train(
            sg,
            rg,
            jnp.asarray(deltas),
            jnp.asarray(ts),
            jnp.asarray(valid),
            1e-4,
        )
        return jnp.sum(res.rgb) + jnp.sum(res.depth) + jnp.sum(res.opacity)

    check_grads(
        f,
        (jnp.asarray(sigmas * 0.02), jnp.asarray(rgbs)),
        order=1,
        modes=("rev",),
        rtol=0.1,
        atol=1e-2,
        eps=1e-2,
    )


def test_background_blend():
    rgb = jnp.asarray([[0.2, 0.2, 0.2]])
    opacity = jnp.asarray([0.75])
    out = np.asarray(apply_background(rgb, opacity, jnp.ones(3)))
    np.testing.assert_allclose(out, [[0.45, 0.45, 0.45]], atol=1e-6)


def test_incremental_matches_single_shot(rng):
    """Two composite rounds == one composite of the concatenated samples."""
    sigmas, rgbs, deltas, ts, counts, valid = _random_inputs(rng, n=6, s=16)
    valid = np.ones_like(valid)
    thr = 1e-4
    full = composite_train(
        jnp.asarray(sigmas),
        jnp.asarray(rgbs),
        jnp.asarray(deltas),
        jnp.asarray(ts),
        jnp.asarray(valid),
        thr,
    )
    o = jnp.zeros(6)
    d = jnp.zeros(6)
    c = jnp.zeros((6, 3))
    for half in (slice(0, 8), slice(8, 16)):
        o, d, c, _ = composite_test_round(
            jnp.asarray(sigmas[:, half]),
            jnp.asarray(rgbs[:, half]),
            jnp.asarray(deltas[:, half]),
            jnp.asarray(ts[:, half]),
            jnp.asarray(valid[:, half]),
            thr,
            o,
            d,
            c,
        )
    np.testing.assert_allclose(np.asarray(o), np.asarray(full.opacity), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(full.depth), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(full.rgb), rtol=1e-3, atol=1e-5)
