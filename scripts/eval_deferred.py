"""Quality A/B: deferred vs per-slab shading on the checker scene.

Trains the SWR pyramid for --steps on the procedural high-frequency
checker, evaluates held-out views, prints PSNR for both shading modes.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import numpy as np


def run(
    deferred: bool,
    steps: int,
    crop: int = 128,
    img: int = 128,
    sigma_res: int = 0,
    n_images: int = 24,
):
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.models.pyramid import PyramidConfig
    from taichi_nerfs_tpu.train.metrics import psnr as psnr_fn
    from taichi_nerfs_tpu.train.swr_step import SwrTrainConfig, SwrTrainer

    train = SyntheticSphereDataset(
        n_images=n_images, img_wh=(img, img), variant="checker",
        n_steps=512,
    )
    test = SyntheticSphereDataset(
        n_images=4, img_wh=(img, img), variant="checker", n_steps=512,
        split="test",
    )
    mcfg = PyramidConfig(
        resolutions=(32, 64, 128, 256), features=8, deferred=deferred,
        sigma_res=sigma_res,
    )
    tcfg = SwrTrainConfig(crop=crop, lr=2e-2, max_steps=steps, n_chunks=16)
    tr = SwrTrainer(mcfg, tcfg, train.rays, train.poses, train.K,
                    train.img_wh)
    t0 = time.time()
    tr.fit(steps, log_every=max(steps // 4, 1))
    dt = time.time() - t0
    w, h = test.img_wh
    ps, ps_full = [], []
    for i in range(len(test)):
        gt = np.asarray(test.rays[i]).reshape(-1, 3)
        out = tr.render(test.poses[i], img_wh=(w, h))
        ps.append(float(psnr_fn(np.asarray(out["rgb"]), gt)))
        # full-lattice render: no information loss from the lat cap
        out = tr.render(test.poses[i], img_wh=(w, h), lat_cap=None)
        ps_full.append(float(psnr_fn(np.asarray(out["rgb"]), gt)))
    print(f"  lat-capped eval: {np.mean(ps):.2f}  "
          f"full-lattice eval: {np.mean(ps_full):.2f}")
    return float(np.mean(ps_full)), dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--modes", default="normal,deferred")
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--sigma_res", type=int, default=0)
    ap.add_argument("--n_images", type=int, default=24)
    args = ap.parse_args()
    for mode in args.modes.split(","):
        psnr, dt = run(
            mode == "deferred", args.steps, crop=args.crop,
            img=args.img, sigma_res=args.sigma_res,
            n_images=args.n_images,
        )
        print(f"{mode}: eval_psnr={psnr:.2f} train_time={dt:.1f}s "
              f"({args.steps} steps, crop {args.crop})")
