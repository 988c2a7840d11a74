"""Pallas fused chunk-sweep vs the XLA scan path and a jnp oracle.

The kernel (ops/swr_pallas.py) runs in interpreter mode on CPU, so these
tests pin (a) forward parity of ``sweep_impl="pallas_interpret"`` against
``sweep_impl="xla"`` through the full renderer, (b) gradient parity of the
hand-derived reverse sweep against JAX autodiff of a straight-line jnp
reference (including the tau output channel), and (c) ``check_grads``
on the custom VJP.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from taichi_nerfs_tpu.data.synthetic import look_at
from taichi_nerfs_tpu.models import pyramid as pyr
from taichi_nerfs_tpu.ops.swr_pallas import chunk_sweep
from taichi_nerfs_tpu.ops.warp import interp_kernel
from taichi_nerfs_tpu.render.swr import render_swr_fixed_axis


def _ref_sweep(vol_cs, rs_par, z_rel, ch_par, nq, kind="linear"):
    """Straight-line jnp mirror of the kernel math (autodiff oracle).

    Channel-leading layouts: vol (nc, dc, F, Rb, Rc), frames
    (nc, F+2, nq, nq).
    """
    nc, dc, F, Rb, Rc = vol_cs.shape

    def interp_T(start, step, n):
        i = jnp.arange(nq, dtype=jnp.float32)[:, None]
        m = jnp.arange(n, dtype=jnp.float32)[None, :]
        return interp_kernel(m - (start + i * step), kind)

    frames = []
    for c in range(nc):
        b0r, db, c0r, dcc, va, h = [ch_par[c, k] for k in range(6)]
        i = jnp.arange(nq, dtype=jnp.float32)
        vb = b0r + db * i[:, None]
        vc = c0r + dcc * i[None, :]
        norm = jnp.sqrt(va * va + vb * vb + vc * vc)
        dt = h * norm / jnp.abs(va)
        acc = jnp.zeros((F - 1, nq, nq))
        dep = jnp.zeros((nq, nq))
        tau = jnp.zeros((nq, nq))
        for s_ in range(dc):
            sb, stb, sc, stc = [rs_par[c, s_, k] for k in range(4)]
            wb = interp_T(sb, stb, Rb)  # (nq, Rb)
            wc = interp_T(sc, stc, Rc)  # (nq, Rc)
            x2 = jnp.einsum("ib,fbc,jc->fij", wb, vol_cs[c, s_], wc)
            sigma = jnp.maximum(x2[0], 0.0)
            sdt = sigma * dt
            a = 1.0 - jnp.exp(-sdt)
            w = a * jnp.exp(-tau)
            t_ray = z_rel[c, s_] * norm / va
            acc = acc + w[None] * x2[1:]
            dep = dep + w * t_ray
            tau = tau + sdt
        frames.append(
            jnp.concatenate(
                [
                    acc,
                    dep[None],
                    (1.0 - jnp.exp(-tau))[None],
                    tau[None],
                ],
                axis=0,
            )
        )
    return jnp.stack(frames)


def _rand_inputs(seed=0, nc=2, dc=3, Rb=8, Rc=8, F=4, nq=8):
    rng = np.random.default_rng(seed)
    # density channel spread around 0 so the relu clamp is exercised but
    # no sample sits exactly on the kink (finite differences there lie)
    vol = rng.normal(0.3, 1.0, (nc, dc, F, Rb, Rc)).astype(np.float32)
    vol[np.abs(vol[:, :, 0:1].repeat(F, 2)) < 0.05] += 0.1
    # resample params: lattice roughly covers the source
    rs = np.stack(
        [
            rng.uniform(-1.0, 1.0, (nc, dc)),  # start_b
            rng.uniform(0.7, 1.3, (nc, dc)),  # step_b
            rng.uniform(-1.0, 1.0, (nc, dc)),  # start_c
            rng.uniform(0.7, 1.3, (nc, dc)),  # step_c
        ],
        axis=-1,
    ).astype(np.float32)
    z_rel = np.linspace(1.0, 2.0, nc * dc, dtype=np.float32).reshape(
        nc, dc
    )
    ch = np.stack(
        [
            rng.uniform(-0.5, 0.0, nc),  # b0 - o_b
            rng.uniform(0.01, 0.05, nc),  # db
            rng.uniform(-0.5, 0.0, nc),  # c0 - o_c
            rng.uniform(0.01, 0.05, nc),  # dc
            np.full(nc, 1.5),  # va
            np.full(nc, 0.1),  # h (slab thickness)
        ],
        axis=-1,
    ).astype(np.float32)
    return (
        jnp.asarray(vol),
        jnp.asarray(rs),
        jnp.asarray(z_rel),
        jnp.asarray(ch),
        nq,
    )


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_chunk_sweep_forward_matches_reference(kind):
    vol, rs, z_rel, ch, nq = _rand_inputs()
    got = chunk_sweep(vol, rs, z_rel, ch, nq, jnp.float32, True, kind)
    want = _ref_sweep(vol, rs, z_rel, ch, nq, kind)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_chunk_sweep_grad_matches_reference_all_channels(kind):
    """Reverse sweep == autodiff of the jnp oracle — with a random
    cotangent on EVERY output channel, including tau (the channel the
    round-1 backward silently dropped).  The cubic case exercises the
    binding sigma clamp (Catmull-Rom undershoot drives resampled sigma
    negative): the backward must reconstruct tau from CLAMPED sigmas
    and gate d alpha/d sigma on the clamp, or it diverges here."""
    vol, rs, z_rel, ch, nq = _rand_inputs(seed=3)
    g = jnp.asarray(
        np.random.default_rng(9).normal(
            size=(vol.shape[0], vol.shape[2] + 2, nq, nq)
        ),
        jnp.float32,
    )

    _, vjp_k = jax.vjp(
        lambda v: chunk_sweep(v, rs, z_rel, ch, nq, jnp.float32, True,
                              kind),
        vol,
    )
    (dvol_k,) = vjp_k(g)
    _, vjp_r = jax.vjp(
        lambda v: _ref_sweep(v, rs, z_rel, ch, nq, kind), vol
    )
    (dvol_r,) = vjp_r(g)
    np.testing.assert_allclose(
        np.asarray(dvol_k), np.asarray(dvol_r), rtol=2e-4, atol=2e-4
    )


def test_cubic_clamp_binds():
    """The cubic grad test above is only meaningful if Catmull-Rom
    undershoot actually drives some resampled sigma negative — pin it."""
    vol, rs, z_rel, ch, nq = _rand_inputs(seed=3)
    nc, dc, F, Rb, Rc = vol.shape

    def interp_T(start, step, n):
        i = jnp.arange(nq, dtype=jnp.float32)[:, None]
        m = jnp.arange(n, dtype=jnp.float32)[None, :]
        return interp_kernel(m - (start + i * step), "cubic")

    n_neg = 0
    for c in range(nc):
        for s_ in range(dc):
            sb, stb, sc, stc = [rs[c, s_, k] for k in range(4)]
            wb = interp_T(sb, stb, Rb)
            wc = interp_T(sc, stc, Rc)
            x2 = jnp.einsum("ib,bc,jc->ij", wb, vol[c, s_, 0], wc)
            n_neg += int(jnp.sum(x2 < -1e-3))
    assert n_neg > 0, "cubic undershoot never binds the sigma clamp"


def test_chunk_sweep_tau_grad_nonzero():
    """d tau / d sigma_k = dt: a tau-only cotangent must produce a
    nonzero density-channel gradient and zero feature-channel gradient."""
    vol, rs, z_rel, ch, nq = _rand_inputs(seed=5)
    F = vol.shape[2]

    def tau_sum(v):
        fr = chunk_sweep(v, rs, z_rel, ch, nq, jnp.float32, True)
        return jnp.sum(fr[:, F + 1])

    dvol = jax.grad(tau_sum)(vol)
    assert float(jnp.max(jnp.abs(dvol[:, :, 0]))) > 1e-3
    np.testing.assert_allclose(np.asarray(dvol[:, :, 1:]), 0.0)


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_chunk_sweep_check_grads(kind):
    vol, rs, z_rel, ch, nq = _rand_inputs(seed=7, nc=1, dc=2, Rb=6, Rc=6)
    check_grads(
        lambda v: chunk_sweep(v, rs, z_rel, ch, nq, jnp.float32, True,
                              kind),
        (vol,),
        order=1,
        modes=["rev"],
        rtol=2e-2,
        atol=2e-2,
    )


@pytest.fixture(scope="module")
def scene():
    cfg = pyr.PyramidConfig(
        resolutions=(16, 32),
        features=4,
        rgb_width=16,
        scale=0.5,
        sigma_bias=0.0,
        deferred=True,
    )
    key = jax.random.PRNGKey(0)
    params = pyr.init_pyramid_params(key, cfg)
    R = cfg.grid_res
    c = (jnp.arange(R) + 0.5) / R - 0.5
    xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
    r = jnp.sqrt(xx**2 + yy**2 + zz**2)
    blob = 2.0 * jnp.exp(-((r / 0.25) ** 2))
    lv = params["levels"][1]
    params["levels"][1] = lv.at[..., 0].add(blob)
    grid = pyr.bake(params, cfg)
    w = h = 24
    focal = 0.9 * w
    K = jnp.asarray(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], jnp.float32
    )
    pose = jnp.asarray(
        look_at(
            np.array([0.3, 0.2, -1.3]),
            np.zeros(3),
            np.array([0.0, 0.0, 1.0]),
        ),
        jnp.float32,
    )
    return cfg, params, grid, pose, K, (w, h)


def _render(scene, grid, sweep_impl, kind="linear"):
    cfg, params, _, pose, K, wh = scene
    return render_swr_fixed_axis(
        params,
        grid,
        cfg,
        pose,
        K,
        wh,
        axis=2,
        flip=False,
        n_chunks=8,
        sweep_impl=sweep_impl,
        resample_kind=kind,
    )


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_render_pallas_matches_xla_forward(scene, kind):
    grid = scene[2]
    a = _render(scene, grid, "xla", kind)
    b = _render(scene, grid, "pallas_interpret", kind)
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )


@pytest.mark.parametrize("kind", ["linear", "cubic"])
def test_render_pallas_matches_xla_grad(scene, kind):
    """End-to-end gradient parity through the renderer wrt the grid."""
    grid = scene[2]

    def loss(g, impl):
        out = _render(scene, g, impl, kind)
        return jnp.mean(out["rgb"] ** 2) + 0.1 * jnp.mean(out["depth"])

    ga = jax.grad(lambda g: loss(g, "xla"))(grid)
    gb = jax.grad(lambda g: loss(g, "pallas_interpret"))(grid)
    na = float(jnp.linalg.norm(ga))
    assert na > 0
    rel = float(jnp.linalg.norm(ga - gb)) / na
    assert rel < 2e-4, f"grad mismatch: rel={rel:.2e}"


def test_render_auto_dispatch_out_of_scope_is_xla(scene):
    """auto on CPU and out-of-scope options must run (no assert, no
    pallas on a non-TPU backend) and agree with the explicit scan."""
    cfg, params, grid, pose, K, wh = scene
    cfg_ps = dataclasses.replace(cfg, deferred=False)
    a = render_swr_fixed_axis(
        params, grid, cfg_ps, pose, K, wh, axis=2, flip=False,
        n_chunks=8, sweep_impl="auto",
    )
    b = render_swr_fixed_axis(
        params, grid, cfg_ps, pose, K, wh, axis=2, flip=False,
        n_chunks=8, sweep_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), rtol=1e-6, atol=1e-6
    )
