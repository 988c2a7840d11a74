"""Profile the sample-gather (reference-parity) train path on the TPU.

Times the full train step and its pieces separately (march, forward
render, forward+backward) at the flagship NGP config, batch 8192, on a
warmed occupancy grid — the cost profile of ``train.py --model_name ngp``.

Usage:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 580 python scripts/profile_parity.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=20, warmup=3, sync=None, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    (sync or (lambda o: jax.tree_util.tree_map(
        lambda x: np.asarray(x[..., :1]), o)))(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    (sync or (lambda o: jax.tree_util.tree_map(
        lambda x: np.asarray(x[..., :1]), o)))(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from taichi_nerfs_tpu.config import Config
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.ops.marching import march_rays, perturb_t_start
    from taichi_nerfs_tpu.ops.rays import get_rays, ray_aabb_intersect
    from taichi_nerfs_tpu.render.renderer import render_train
    from taichi_nerfs_tpu.train.loop import Trainer
    from taichi_nerfs_tpu.train.step import sample_batch, train_step

    cfg = Config()
    scene = SyntheticSphereDataset(
        n_images=8, img_wh=(256, 256), variant="checker", n_steps=256
    )
    trainer = Trainer(
        cfg, scene.as_batch(), scene.K, scene.img_wh,
        log_fn=lambda *a, **k: None,
    )
    # settle grid + caps like a real run
    for _ in range(40):
        m = trainer.run_step()
    float(m["loss"])
    sample_cap, pack_cap = trainer.sample_cap, trainer.pack_cap
    print(f"settled: sample_cap={sample_cap} pack_cap={pack_cap}")

    state, data = trainer.state, trainer.data
    key = jax.random.PRNGKey(7)
    k_b, k_r = jax.random.split(key)
    rgb_gt, pose, direction = sample_batch(
        k_b, data, cfg.train.batch_size, cfg.train.ray_sampling_strategy
    )
    rays_o, rays_d = get_rays(direction, pose)

    # piece 1: march only
    hits = ray_aabb_intersect(rays_o, rays_d, cfg.model.scale)
    noise = jax.random.uniform(k_r, (cfg.train.batch_size,))
    t_start = perturb_t_start(
        hits, noise, cfg.render.exp_step_factor, cfg.model.grid_size,
        cfg.model.scale,
    )
    march = jax.jit(
        lambda o, d, t0_, t1_, bf: march_rays(
            o, d, t0_, t1_, bf,
            cascades=cfg.model.cascades, scale=cfg.model.scale,
            exp_step_factor=cfg.render.exp_step_factor,
            grid_size=cfg.model.grid_size, sample_cap=sample_cap,
        )
    )
    ms = timed(
        march, rays_o, rays_d, t_start, hits[:, 1],
        state.occupancy.bitfield,
        sync=lambda o: np.asarray(o.counts[:1]),
    )
    print(f"march_rays:            {ms:7.2f} ms")

    # piece 2: forward render (march + field eval + composite)
    fwd = jax.jit(
        lambda p, bf: render_train(
            p, cfg.model, cfg.render, bf, rays_o, rays_d, k_r,
            sample_cap, pack_cap,
        )
    )
    ms = timed(
        fwd, state.params, state.occupancy.bitfield,
        sync=lambda o: np.asarray(o["rgb"][:1]),
    )
    print(f"render_train fwd:      {ms:7.2f} ms")

    # piece 3: fwd + bwd (loss grad)
    def loss_fn(p, bf):
        r = render_train(
            p, cfg.model, cfg.render, bf, rays_o, rays_d, k_r,
            sample_cap, pack_cap,
        )
        return jnp.mean((r["rgb"] - rgb_gt) ** 2)

    grad = jax.jit(jax.grad(loss_fn))
    ms = timed(
        grad, state.params, state.occupancy.bitfield,
        sync=lambda o: np.asarray(o["xyz_mlp"]["w0"][:1, :1]),
    )
    print(f"render_train fwd+bwd:  {ms:7.2f} ms")

    # whole step through the Trainer (optimizer + metrics + grid cadence;
    # train_step donates its state, so time the carried loop)
    del state
    n = 40
    t0 = time.perf_counter()
    for _ in range(n):
        m = trainer.run_step()
    float(m["loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    rays_s = cfg.train.batch_size / (ms / 1e3)
    print(f"trainer.run_step:      {ms:7.2f} ms  ({rays_s/1e3:.0f}K rays/s)")


if __name__ == "__main__":
    main()
