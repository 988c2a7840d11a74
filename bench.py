"""Benchmark: steady-state training throughput on the flagship NGP config.

Prints ONE JSON line.  Baseline: the reference trains Lego (batch 8192,
20000 steps) in 208 s on an RTX 3090 (README.md:33-37) — an effective
training throughput of 8192 * 20000 / 208 = 787,692 rays/s.  This benchmark
trains the flagship config (hash 16 levels, 2^19 entries, 128^3 occupancy
grid) on the built-in synthetic scene until the occupancy grid reaches
steady state, then times full train steps end-to-end.
"""

from __future__ import annotations

import json
import time

import jax


def main():
    from taichi_nerfs_tpu.config import config_for_scene
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.train import Trainer

    cfg = config_for_scene(scale=0.5)
    # cache the oracle-rendered scene (single-core numpy, ~1 min to build)
    import os

    import numpy as np

    cache = "/tmp/tnerf_bench_scene_v1.npz"
    if os.path.exists(cache):
        scene = SyntheticSphereDataset(n_images=1, img_wh=(128, 128))
        data = np.load(cache)
        scene.rays, scene.poses = data["rays"], data["poses"]
    else:
        scene = SyntheticSphereDataset(n_images=16, img_wh=(128, 128))
        np.savez(cache, rays=scene.rays, poses=scene.poses)
    trainer = Trainer(
        cfg, scene.as_batch(), scene.K, scene.img_wh, log_fn=lambda *_: None
    )

    # converge the occupancy grid + settle the sample-cap bucket
    warm_steps = 450
    for _ in range(warm_steps):
        trainer.run_step()
    jax.block_until_ready(trainer.state.params)

    # timed steady-state steps
    n_timed = 200
    t0 = time.perf_counter()
    m = None
    for _ in range(n_timed):
        m = trainer.run_step()
    jax.block_until_ready(m["loss"])
    elapsed = time.perf_counter() - t0

    rays_per_sec = cfg.train.batch_size * n_timed / elapsed
    baseline = 8192 * 20000 / 208.0  # reference Lego throughput
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
