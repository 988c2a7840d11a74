"""Parity-path layout-capacity trade (VERDICT r4 item 6): fewer rows per ray.

The round-4 roofline (``docs/roofline_parity.json``) put the sample-gather
train step within ~1.3x of its access-bound floor at the CURRENT layout —
8 brick levels x F=4, one row-gather per (sample, level).  The named trade:
halve the per-sample row count by folding the ladder to 4 levels x F=8
(same 32-dim encoder output, same hashed capacity at log2_rows=17), with
bf16 rows so the 64-value row stays inside the ~128 B free-gather width
(``docs/status_r3.md`` measured row width free up to ~128 B).

This script measures BOTH sides of the trade on the bench scene
(``bench.py``'s checker sphere):

* steady-state rays/s through ``Trainer.run_step`` (settled grid + caps),
* held-out PSNR after an equal step budget, rendered by the test pipeline.

Usage:
    PYTHONPATH="/root/repo:$PYTHONPATH" timeout 1200 \
        python scripts/parity_trade.py [--steps 768] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def measure(name, cfg, scene, test_scene, steps):
    from taichi_nerfs_tpu.ops.rays import get_rays
    from taichi_nerfs_tpu.render import render_image
    from taichi_nerfs_tpu.train import Trainer
    from taichi_nerfs_tpu.train.metrics import psnr

    trainer = Trainer(
        cfg, scene.as_batch(), scene.K, scene.img_wh,
        log_fn=lambda *a, **k: None,
    )
    m = trainer.run_step()
    float(m["loss"])  # big compile
    # settle: past warmup + a few refreshes, like bench.bench_parity
    while trainer.step < steps:
        for _ in range(16):
            m = trainer.run_step()
        float(m["loss"])
    # timed window
    t0 = time.perf_counter()
    n_timed = 48
    for _ in range(n_timed):
        m = trainer.run_step()
    float(m["loss"])
    dt = time.perf_counter() - t0
    rays_s = cfg.train.batch_size * n_timed / dt
    # held-out quality at the equal step budget
    ps = []
    for i in range(len(test_scene.poses)):
        rays_o, rays_d = get_rays(
            test_scene.directions, test_scene.poses[i]
        )
        out = render_image(
            trainer.state.params, cfg, trainer.state.occupancy.bitfield,
            rays_o, rays_d,
        )
        ps.append(float(psnr(np.asarray(out["rgb"]),
                             np.asarray(test_scene.rays[i]))))
    p = float(np.mean(ps))
    rec = {
        "name": name,
        "levels": cfg.model.brick.levels,
        "F": cfg.model.brick.feature_per_level,
        "table_dtype": cfg.model.brick.table_dtype,
        "rays_per_s": round(rays_s, 1),
        "step_ms": round(dt / n_timed * 1e3, 2),
        "steps": int(trainer.step),
        "eval_psnr": round(p, 2),
        "sample_cap": int(trainer.sample_cap),
        "pack_cap": int(trainer.pack_cap or 0),
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=768,
                    help="settle budget before the timed window")
    ap.add_argument("--json", default="")
    ap.add_argument("--only", default="",
                    help="comma list of config names to run")
    args = ap.parse_args()

    import dataclasses

    from taichi_nerfs_tpu.config import BrickGridConfig, config_for_scene
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset

    # bench.py's scene, plus a held-out rig for the quality side
    scene = SyntheticSphereDataset(
        n_images=8, img_wh=(256, 256), variant="checker", n_steps=256
    )
    test_scene = SyntheticSphereDataset(
        split="test", n_images=3, img_wh=(256, 256), variant="checker",
        n_steps=256,
    )

    def cfg_with(brick):
        cfg = config_for_scene(0.5)
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, brick=brick)
        )

    candidates = {
        # round-4 recorded layout (the baseline side of the trade)
        "8x4_fp32": cfg_with(BrickGridConfig()),
        # half the rows, same capacity, rows at the 128 B free width
        "4x8_bf16": cfg_with(BrickGridConfig(
            levels=4, feature_per_level=8, log2_rows=17,
            table_dtype="bfloat16",
        )),
        # ablation: row-count cut alone (256 B fp32 rows)
        "4x8_fp32": cfg_with(BrickGridConfig(
            levels=4, feature_per_level=8, log2_rows=17,
        )),
        # ablation: dtype cut alone
        "8x4_bf16": cfg_with(BrickGridConfig(table_dtype="bfloat16")),
    }
    only = [s for s in args.only.split(",") if s]
    out = []
    for name, cfg in candidates.items():
        if only and name not in only:
            continue
        out.append(measure(name, cfg, scene, test_scene, args.steps))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
