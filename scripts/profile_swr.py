"""Profile the SWR train step piecewise on the attached TPU.

Times: full step / bake fwd+bwd / sweep fwd / sweep fwd+bwd / TV / adam,
plus the 800^2 and 400^2 eval renders.  Host-readback sync (tunnel-safe).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30, warm=5, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.device_get(leaves[0]).reshape(-1)[:1])


def main():
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr_fixed_axis
    from taichi_nerfs_tpu.train.swr_step import (
        SwrTrainConfig,
        create_swr_state,
        make_optimizer,
        swr_train_step,
    )

    mcfg = pyr.PyramidConfig(resolutions=(32, 64, 128, 256), features=8)
    tcfg = SwrTrainConfig(crop=128, lr=2e-2, max_steps=20000, n_chunks=16)
    state = create_swr_state(jax.random.PRNGKey(0), mcfg, tcfg)

    # synthetic pose: camera at +z looking at origin, radius 1.5
    pose = np.eye(3, 4, dtype=np.float32)
    pose[:, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    pose[2, 3] = 1.5
    pose = jnp.asarray(pose)
    f = 0.5 * 800 / np.tan(0.5 * 0.6911)
    K800 = jnp.asarray(
        [[f, 0, 400.0], [0, f, 400.0], [0, 0, 1.0]], jnp.float32
    )
    img = jnp.zeros((800, 800, 3), jnp.float32)
    c = tcfg.crop
    crop_xy = jnp.asarray([336, 336], jnp.int32)
    axis, flip = 2, True

    from taichi_nerfs_tpu.render.swr import slab_window_bound

    win = slab_window_bound(
        np.asarray(pose)[None], np.asarray(K800), (800, 800), mcfg,
        crop=tcfg.crop,
    )
    print(f"slab window:      {win}")

    # --- full step (donating: thread the state through)
    def time_full(state, tc, n=30, warm=5, window=0):
        for _ in range(warm):
            state, m = swr_train_step(
                state, img, pose, K800, crop_xy, mcfg, tc, axis, flip,
                slab_window=window,
            )
        _sync(m)
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = swr_train_step(
                state, img, pose, K800, crop_xy, mcfg, tc, axis, flip,
                slab_window=window,
            )
        _sync(m)
        return (time.perf_counter() - t0) / n, state

    def time_full_cfg(mc, tc, window=0, n=30, warm=5):
        st = create_swr_state(jax.random.PRNGKey(0), mc, tc)
        for _ in range(warm):
            st, m = swr_train_step(
                st, img, pose, K800, crop_xy, mc, tc, axis, flip,
                slab_window=window,
            )
        _sync(m)
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = swr_train_step(
                st, img, pose, K800, crop_xy, mc, tc, axis, flip,
                slab_window=window,
            )
        _sync(m)
        return (time.perf_counter() - t0) / n

    t_full, _ = time_full(state, tcfg)
    print(f"full step:        {t_full * 1e3:8.2f} ms")
    import dataclasses

    mcfg_d = dataclasses.replace(mcfg, deferred=True)
    t_fulld = time_full_cfg(mcfg_d, tcfg)
    print(f"full step defer:  {t_fulld * 1e3:8.2f} ms")
    for crop in (192, 256):
        tc = dataclasses.replace(tcfg, crop=crop)
        t_c = time_full_cfg(mcfg_d, tc, n=20)
        print(
            f"defer crop {crop}:   {t_c * 1e3:8.2f} ms "
            f"({crop * crop / t_c / 1e3:7.1f}K rays/s)"
        )
    state = create_swr_state(jax.random.PRNGKey(0), mcfg, tcfg)

    params = state.params

    bake_j = jax.jit(pyr.bake, static_argnames="cfg")

    # --- bake fwd+bwd
    @jax.jit
    def bake_vjp(p):
        g, f_vjp = jax.vjp(lambda p: pyr.bake(p, mcfg), p)
        return f_vjp(g)

    t_bakeb = timeit(bake_vjp, params, n=30)
    print(f"bake fwd+bwd:     {t_bakeb * 1e3:8.2f} ms")

    grid = bake_j(params, mcfg)
    K_crop = K800.at[0, 2].add(-336.0).at[1, 2].add(-336.0)

    # --- sweep fwd (crop-sized render from a pre-baked grid)
    def sweep(params, grid, window=0):
        return render_swr_fixed_axis(
            params, grid, mcfg, pose, K_crop, (c, c), axis, flip,
            n_chunks=tcfg.n_chunks, slab_window=window,
        )["rgb"]

    t_sw = timeit(sweep, params, grid, n=30)
    print(f"sweep fwd (128):  {t_sw * 1e3:8.2f} ms")
    t_sww = timeit(lambda p, g: sweep(p, g, win), params, grid, n=30)
    print(f"sweep fwd win:    {t_sww * 1e3:8.2f} ms")

    # --- sweep fwd+bwd
    def make_sweep_grad(window):
        def loss(p, g):
            return jnp.mean(sweep(p, g, window) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    sg0, sgw = make_sweep_grad(0), make_sweep_grad(win)
    t_swb = timeit(sg0, params, grid, n=10)
    print(f"sweep fwd+bwd:    {t_swb * 1e3:8.2f} ms")
    t_swbw = timeit(sgw, params, grid, n=10)
    print(f"sweep fwd+bwd w:  {t_swbw * 1e3:8.2f} ms")

    # --- full loss fwd+bwd without TV/L1
    tcfg0 = SwrTrainConfig(
        crop=128, lr=2e-2, max_steps=20000, n_chunks=16,
        sigma_l1=0.0, tv_w=0.0,
    )
    state0 = create_swr_state(jax.random.PRNGKey(0), mcfg, tcfg0)
    t_full0, _ = time_full(state0, tcfg0)
    print(f"full step no-reg: {t_full0 * 1e3:8.2f} ms")

    # --- adam update alone
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)

    @jax.jit
    def adam(params, opt_state):
        grads = jax.tree.map(jnp.ones_like, params)
        upd, new_os = opt.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, upd), new_os

    t_adam = timeit(adam, params, opt_state, n=30)
    print(f"adam (dummy g):   {t_adam * 1e3:8.2f} ms")

    # --- eval renders
    lat = int(1.25 * mcfg.grid_res) + 16
    for wh in (400, 800):
        Kw = jnp.asarray(
            [
                [f * wh / 800, 0, wh / 2.0],
                [0, f * wh / 800, wh / 2.0],
                [0, 0, 1.0],
            ],
            jnp.float32,
        )

        def make_rend_cfg(mc, lat_size, rdt, skip=False):
            def rend(params, grid):
                return render_swr_fixed_axis(
                    params, grid, mc, pose, Kw, (wh, wh), axis, flip,
                    n_chunks=tcfg.n_chunks, lat_size=lat_size,
                    resample_dtype=rdt, skip_empty=skip,
                )["rgb"]

            return rend

        # sparse grid: object occupies the central ~40% of slabs (a
        # trained scene's occupancy), zero sigma elsewhere
        R = mcfg.grid_res
        band = jnp.zeros((R,), jnp.float32).at[
            int(0.3 * R) : int(0.7 * R)
        ].set(1.0)
        grid_sparse = grid.at[..., 0].mul(band[None, None, :])

        cap = lat if wh + 16 > lat else 0
        for tag, mc, ls, rdt, skip, g in (
            ("cap fp32     ", mcfg, cap, "float32", False, grid),
            ("cap defer    ", mcfg_d, cap, "float32", False, grid),
            ("capdef bf    ", mcfg_d, cap, "bfloat16", False, grid),
            ("capdef bf skp", mcfg_d, cap, "bfloat16", True, grid_sparse),
        ):
            t_r = timeit(make_rend_cfg(mc, ls, rdt, skip), params, g, n=10)
            print(f"render {wh}^2 {tag}: {t_r * 1e3:8.2f} ms  "
                  f"({1.0 / t_r:5.1f} fps)")


if __name__ == "__main__":
    main()
