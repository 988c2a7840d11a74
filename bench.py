"""Benchmark: steady-state training throughput, flagship + parity paths.

Prints ONE JSON line.  Baseline: the reference trains Lego (batch 8192,
20000 steps) in 208 s on an RTX 3090 (README.md:33-37) — an effective
training throughput of 8192 * 20000 / 208 = 787,692 rays/s.

Two tracked numbers (VERDICT r1: "the bench should report both paths"):

* ``value`` (headline): the dense shear-warp flagship
  (docs/shear_warp.md) — a 256^3x8 feature pyramid trained on 256^2
  image crops; every train-step op is dense streaming or an MXU matmul.
* ``parity_rays_per_sec``: the reference-architecture sample-gather path
  (hash-NGP + occupancy marching + packed field eval) at the reference's
  batch 8192, including the amortized density-grid refresh cadence.

The scene is the built-in procedural high-frequency checker solid (no
dataset download needed).
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np


def bench_parity(scene) -> float:
    """Steady-state rays/s of the sample-gather (reference-parity) path:
    default flagship NGP config, batch 8192, through Trainer.run_step —
    adaptive sample/pack caps and the 1/16-cadence grid refresh included,
    exactly the cost profile of ``train.py --model_name ngp``."""
    from taichi_nerfs_tpu.config import Config
    from taichi_nerfs_tpu.train.loop import Trainer

    cfg = Config()
    trainer = Trainer(
        cfg,
        scene.as_batch(),
        scene.K,
        scene.img_wh,
        log_fn=lambda *a, **k: None,
    )
    for _ in range(80):  # warmup: grid cadence, cap adaptation, compiles
        m = trainer.run_step()
    float(m["loss"])
    n_timed = 120
    t0 = time.perf_counter()
    for _ in range(n_timed):
        m = trainer.run_step()
    float(m["loss"])
    return cfg.train.batch_size * n_timed / (time.perf_counter() - t0)


def main():
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.models.pyramid import PyramidConfig
    from taichi_nerfs_tpu.train.swr_step import SwrTrainConfig, SwrTrainer

    # throughput bench: gt content only feeds the loss value, so a few
    # coarse views suffice (quality runs use scripts/eval_deferred.py)
    cache = "/tmp/tnerf_bench_checker_v3.npz"
    if os.path.exists(cache):
        scene = SyntheticSphereDataset(
            n_images=1, img_wh=(256, 256), variant="checker"
        )
        d = np.load(cache)
        scene.rays, scene.poses = d["rays"], d["poses"]
    else:
        scene = SyntheticSphereDataset(
            n_images=8, img_wh=(256, 256), variant="checker", n_steps=256
        )
        np.savez(cache, rays=scene.rays, poses=scene.poses)

    # deferred shading measured quality-parity with per-sample shading
    # (scripts/eval_deferred.py: 24.6 vs 24.7 eval PSNR on this scene)
    # at ~15% faster steps; crop 256 amortizes the bake + optimizer over
    # 4x the rays/step
    mcfg = PyramidConfig(
        resolutions=(32, 64, 128, 256), features=8, deferred=True
    )
    tcfg = SwrTrainConfig(crop=256, lr=2e-2, max_steps=20000, n_chunks=16)
    trainer = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )

    # warm every (axis, flip) program + settle compile caches
    for _ in range(60):
        m = trainer.run_step()
    float(m["loss"])  # host readback: the only reliable sync on a tunnel

    n_timed = 200
    t0 = time.perf_counter()
    for _ in range(n_timed):
        m = trainer.run_step()
    float(m["loss"])
    elapsed = time.perf_counter() - t0

    rays_per_sec = tcfg.crop**2 * n_timed / elapsed
    parity_rays = bench_parity(scene)
    baseline = 8192 * 20000 / 208.0  # reference Lego throughput
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 3),
                "parity_rays_per_sec": round(parity_rays, 1),
                "parity_vs_baseline": round(parity_rays / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
