"""Hyperparameter sweep for the SWR pyramid on the 800^2 checker proxy.

Runs several (lr, tv_w, sigma_l1, features, steps) configs back-to-back in
one process (GT images come from the disk cache after the first run) and
prints train time + held-out PSNR per config.  Used to tune the
time-to-quality headline (BASELINE.md: Lego 35 PSNR in 208 s).
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def run_cfg(train, test, *, steps, lr, tv_w, sigma_l1, features,
            sigma_res=0, crop=256, n_chunks=16,
            resample_dtype="float32", prog=(), distortion_w=0.0,
            near=0.0):
    import jax

    from taichi_nerfs_tpu.models.pyramid import PyramidConfig
    from taichi_nerfs_tpu.train.metrics import psnr as psnr_fn
    from taichi_nerfs_tpu.train.swr_step import SwrTrainConfig, SwrTrainer

    mcfg = PyramidConfig(
        resolutions=(32, 64, 128, 256), features=features, deferred=True,
        sigma_res=sigma_res,
    )
    tcfg = SwrTrainConfig(
        crop=crop, lr=lr, max_steps=steps, n_chunks=n_chunks,
        tv_w=tv_w, sigma_l1=sigma_l1, resample_dtype=resample_dtype,
        prog_steps=tuple(prog), distortion_w=distortion_w, near=near,
    )
    tr = SwrTrainer(mcfg, tcfg, train.rays, train.poses, train.K,
                    train.img_wh)
    t0 = time.time()
    tr.fit(steps, log_every=10**9, log_fn=lambda *_: None)
    m = jax.device_get(tr.run_step())
    dt = time.time() - t0
    w, h = test.img_wh
    ps = []
    for i in range(len(test)):
        out = tr.render(test.poses[i], img_wh=(w, h), lat_cap=None)
        gt = np.asarray(test.rays[i]).reshape(-1, 3)
        ps.append(float(psnr_fn(np.asarray(out["rgb"]), gt)))
    return float(np.mean(ps)), dt, float(m["psnr"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--n_images", type=int, default=100)
    ap.add_argument("--steps", type=int, default=1900)
    ap.add_argument("--variant", type=str, default="checker",
                    choices=["sphere", "checker", "shell"])
    args = ap.parse_args()

    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset

    train = SyntheticSphereDataset(
        n_images=args.n_images, img_wh=(args.img, args.img),
        variant=args.variant, n_steps=512,
    )
    test = SyntheticSphereDataset(
        n_images=4, img_wh=(args.img, args.img), variant=args.variant,
        n_steps=512, split="test",
    )

    base = dict(steps=args.steps, lr=2e-2, tv_w=3e-3, sigma_l1=1e-5,
                features=8)
    # round 7: coarse-to-fine (prog_steps) vs the single-phase default at
    # comparable wall time — coarse steps are ~4-8x cheaper, so the
    # progressive runs buy extra optimizer steps for free
    # round 8: inside-camera (shell) quality + confirmed prog landmarks
    # (base 29.02@411s; prog 5000: 35.21@604s; 8000: 39.37@590s; 12000:
    # 44.36@1062s — beats the 43.77@1274s single-phase record)
    sweeps = [
        ("f16 dist1e-2 near.1", {"features": 16, "steps": 3000,
                                 "distortion_w": 1e-2, "near": 0.1}),
        ("f16 dist2e-3 near.1", {"features": 16, "steps": 3000,
                                 "distortion_w": 2e-3, "near": 0.1}),
    ]
    for name, over in sweeps:
        cfg = {**base, **over}
        psnr, dt, tr_psnr = run_cfg(train, test, **cfg)
        print(
            f"{name}: eval={psnr:5.2f}  train_psnr={tr_psnr:5.2f}  "
            f"time={dt:6.1f}s  ({cfg})",
            flush=True,
        )


if __name__ == "__main__":
    main()
