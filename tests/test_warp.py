"""Roll-select affine resampler vs a numpy gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_nerfs_tpu.ops.warp import (
    drift_window,
    resample_affine,
    resample_affine_2d,
)


def _oracle_1d(x, start, step, out_len):
    n = x.shape[-1]
    out = np.zeros(x.shape[:-1] + (out_len,), x.dtype)
    for i in range(out_len):
        p = start + i * step
        b = int(np.floor(p))
        f = p - b
        if b < 0 or b > n - 1:
            continue
        v = x[..., b] * (1 - f)
        if b + 1 <= n - 1:
            v = v + x[..., b + 1] * f
        out[..., i] = v
    return out


@pytest.mark.parametrize(
    "n,out_len,start,step",
    [
        (64, 64, 0.0, 1.0),  # identity
        (64, 64, -2.3, 1.05),
        (64, 64, 3.7, 0.91),
        (48, 64, 0.4, 0.7),  # upsample
        (96, 64, -1.0, 1.4),  # downsample
    ],
)
def test_resample_matches_oracle(n, out_len, start, step):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, n)).astype(np.float32)
    d_min, d_max = drift_window(start - 0.5, start + 0.5, step, step, out_len)
    got = np.asarray(
        jax.jit(
            lambda x, s, st: resample_affine(
                x, s, st, out_len, d_min, d_max
            )
        )(jnp.asarray(x), jnp.float32(start), jnp.float32(step))
    )
    want = _oracle_1d(x, start, step, out_len)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_resample_axis0():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 7)).astype(np.float32)
    d_min, d_max = drift_window(-1.0, 1.0, 0.9, 1.1, 32)
    got = np.asarray(
        resample_affine(
            jnp.asarray(x), jnp.float32(0.5), jnp.float32(1.02), 32,
            d_min, d_max, axis=0,
        )
    )
    want = _oracle_1d(np.swapaxes(x, 0, 1), 0.5, 1.02, 32)
    np.testing.assert_allclose(got, np.swapaxes(want, 0, 1), rtol=1e-3,
                               atol=2e-5)


def test_resample_2d_separable():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 48, 3)).astype(np.float32)
    wr = drift_window(-2, 2, 0.9, 1.1, 40)
    wc = drift_window(-2, 2, 0.9, 1.1, 48)
    got = np.asarray(
        resample_affine_2d(
            jnp.asarray(x),
            jnp.float32(1.2), jnp.float32(0.95),
            jnp.float32(-0.7), jnp.float32(1.08),
            (40, 48), wr, wc,
        )
    )
    # oracle: rows then cols
    step1 = _oracle_1d(np.moveaxis(x, 0, -1), 1.2, 0.95, 40)
    step1 = np.moveaxis(step1, -1, 0)
    want = _oracle_1d(np.moveaxis(step1, 1, -1), -0.7, 1.08, 48)
    want = np.moveaxis(want, -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_resample_grad_is_transpose():
    """Autodiff through the resample: d/dx of sum(resample) == resample of
    ones transposed — spot-check by finite difference on a few entries."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    d_min, d_max = drift_window(-1, 1, 0.95, 1.05, 16)

    def loss(x):
        return jnp.sum(
            resample_affine(
                x, jnp.float32(0.3), jnp.float32(1.02), 16, d_min, d_max
            )
            * cot
        )

    g = np.asarray(jax.grad(loss)(x))
    eps = 1e-3
    for k in (0, 5, 11, 15):
        lp = loss(x.at[k].add(eps))
        lm = loss(x.at[k].add(-eps))
        np.testing.assert_allclose(
            g[k], (lp - lm) / (2 * eps), rtol=5e-2, atol=1e-3
        )


class TestWindowedMatmul:
    """resample_matmul_windowed vs the full-matmul resampler."""

    @pytest.mark.parametrize(
        "n,out_len,start,step,window",
        [
            (256, 144, 40.2, 0.31, 64),   # training-crop regime
            (256, 144, -0.7, 0.18, 32),   # support crosses the low edge
            (256, 144, 230.5, 0.25, 64),  # support crosses the high edge
            (256, 144, -80.0, 0.2, 32),   # fully below the source
            (256, 144, 300.0, 0.2, 32),   # fully above the source
            (256, 144, 120.0, -0.3, 64),  # negative step
            (64, 144, 10.0, 0.3, 128),    # window >= n fallback
        ],
    )
    def test_matches_full(self, n, out_len, start, step, window):
        from taichi_nerfs_tpu.ops.warp import (
            resample_matmul,
            resample_matmul_windowed,
        )

        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, n, 8)).astype(np.float32)
        want = np.asarray(
            jax.jit(lambda x, s, st: resample_matmul(x, s, st, out_len, 1))(
                jnp.asarray(x), jnp.float32(start), jnp.float32(step)
            )
        )
        got = np.asarray(
            jax.jit(
                lambda x, s, st: resample_matmul_windowed(
                    x, s, st, out_len, 1, window
                )
            )(jnp.asarray(x), jnp.float32(start), jnp.float32(step))
        )
        # atol floor: the windowed form sums the same products in a
        # different order; observed up to ~1.2e-5 abs drift on hosts
        # whose XLA:CPU codegen differs from the cache's AOT machine
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-5)

    def test_window_helper_covers(self):
        from taichi_nerfs_tpu.ops.warp import resample_window

        assert resample_window(0.3, 144) >= 0.3 * 143 + 2
        assert resample_window(0.3, 144) % 32 == 0

    def test_grad_matches_full(self):
        from taichi_nerfs_tpu.ops.warp import (
            resample_matmul,
            resample_matmul_windowed,
        )

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 256, 4)).astype(np.float32))
        start, step = jnp.float32(50.3), jnp.float32(0.27)

        def loss_full(x):
            return jnp.sum(resample_matmul(x, start, step, 144, 1) ** 2)

        def loss_win(x):
            return jnp.sum(
                resample_matmul_windowed(x, start, step, 144, 1, 64) ** 2
            )

        gf = jax.jit(jax.grad(loss_full))(x)
        gw = jax.jit(jax.grad(loss_win))(x)
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gf), rtol=1e-4, atol=1e-5
        )


def test_interp_matrix_cubic_oracle():
    """Catmull-Rom interpolation matrix vs a direct numpy oracle, and
    exactness at integer sample positions (kernel property k(0)=1,
    k(+-1)=k(+-2)=0 — identity when the grid aligns)."""
    import numpy as np

    from taichi_nerfs_tpu.ops.warp import interp_matrix, resample_matmul

    n, out_len = 24, 17
    x = np.cos(np.linspace(0, 3.0, n)).astype(np.float32)

    # identity: start=0, step=1 reproduces the signal exactly
    w_id = np.asarray(interp_matrix(0.0, 1.0, n, n, kind="cubic"))
    np.testing.assert_allclose(x @ w_id, x, atol=1e-6)

    # oracle at fractional positions
    start, step = 1.3, 1.17
    pos = start + np.arange(out_len) * step

    def cr(t):
        at = abs(t)
        if at <= 1:
            return (1.5 * at - 2.5) * at * at + 1.0
        if at < 2:
            return ((-0.5 * at + 2.5) * at - 4.0) * at + 2.0
        return 0.0

    want = np.zeros(out_len, np.float32)
    for i, p in enumerate(pos):
        for m in range(n):
            want[i] += x[m] * cr(m - p)
    got = np.asarray(
        resample_matmul(
            jnp.asarray(x)[None], jnp.float32(start), jnp.float32(step),
            out_len, axis=1, kind="cubic",
        )
    )[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_render_cubic_resample_close_to_linear():
    """A cubic-kernel render of smooth content stays close to the
    linear-kernel render (same geometry, sharper reconstruction), and
    is finite; pins the resample_kind plumbing end-to-end."""
    import numpy as np

    from taichi_nerfs_tpu.data.synthetic import look_at
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr

    cfg = pyr.PyramidConfig(
        resolutions=(16, 32), features=4, rgb_width=16, scale=0.5,
        sigma_bias=0.0,
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
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
    lin = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=8,
                     sweep_impl="xla")
    cub = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=8,
                     sweep_impl="xla", resample_kind="cubic")
    a, b = np.asarray(cub["rgb"]), np.asarray(lin["rgb"])
    assert np.all(np.isfinite(a))
    mse = float(np.mean((a - b) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 28.0, f"cubic diverges from linear: {psnr:.1f}"
