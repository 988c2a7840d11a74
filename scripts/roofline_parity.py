"""Brick parity-path stage analysis at TRUE steady state.

Round-3 verdict item 5: commit a measured chip-ceiling analysis for the
brick parity path and show the pipeline is within ~1.5x of its stage
floors (or close the gap).

Method: settle the real trainer DEEP (to step ~800, like bench.py —
the adaptive sample caps grow for a few hundred post-warmup steps and
the steady regime is 2x slower per ray than the shallow regime round 3
timed), then measure each pipeline stage AS IMPLEMENTED at the settled
shapes:

* march        — the interval marcher (``ops/marching.py``);
* field fwd    — brick encode + MLPs (``render_train`` forward);
* field bwd    — the loss gradient (adds encoder scatter + MLP bwd);
* grid refresh — amortized per step (1/16 cadence);
* optimizer    — adam update at the parameter count.

The stage sum vs the measured ``trainer.run_step`` bounds dispatch and
cadence overhead; the dominant stage's access arithmetic (rows/sample x
measured row rates, docs/status_r3.md) is the chip-ceiling argument.
Reference behavior anchor: modules/ray_march.py:8-194 +
hash_encoder.py:14-145.

Usage:
    PYTHONPATH="/root/repo:$PYTHONPATH" timeout 900 \
        python scripts/roofline_parity.py [--json docs/roofline_parity.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]))[:1]


def timed_ms(fn, *args, n=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--settle_steps", type=int, default=800)
    args = ap.parse_args()

    from taichi_nerfs_tpu.config import config_for_scene
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.ops.brick_encoder import build_brick_layout
    from taichi_nerfs_tpu.ops.rays import get_rays, ray_aabb_intersect
    from taichi_nerfs_tpu.render.renderer import render_train
    from taichi_nerfs_tpu.train.loop import Trainer
    from taichi_nerfs_tpu.train.step import sample_batch

    cfg = config_for_scene(0.5)  # the bench's parity config (brick)
    scene = SyntheticSphereDataset(
        n_images=8, img_wh=(256, 256), variant="checker", n_steps=256
    )
    trainer = Trainer(
        cfg, scene.as_batch(), scene.K, scene.img_wh,
        log_fn=lambda *a, **k: None,
    )
    t0 = time.perf_counter()
    m = None
    while trainer.step < args.settle_steps:
        for _ in range(16):
            m = trainer.run_step()
        float(m["loss"])
    print(f"settled to step {trainer.step} in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    mm = {k: float(v) for k, v in m.items()}
    B = cfg.train.batch_size
    S, P = trainer.sample_cap, trainer.pack_cap
    layout = build_brick_layout(cfg.model.brick)
    print(
        f"steady shapes: batch={B} sample_cap={S} pack_cap={P} "
        f"levels={layout.levels} rows/sample={layout.levels} "
        f"rm_s={mm.get('rm_s', -1):.1f}",
        flush=True,
    )

    state, data = trainer.state, trainer.data
    key = jax.random.PRNGKey(7)
    k_b, k_r = jax.random.split(key)
    rgb_gt, pose, direction = sample_batch(
        k_b, data, B, cfg.train.ray_sampling_strategy
    )
    rays_o, rays_d = get_rays(direction, pose)
    stages = {}

    # march (the interval marcher as dispatched by render_train)
    from taichi_nerfs_tpu.ops.marching import march_rays, perturb_t_start

    hits = ray_aabb_intersect(rays_o, rays_d, cfg.model.scale)
    noise = jax.random.uniform(k_r, (B,))
    t_start = perturb_t_start(
        hits, noise, cfg.render.exp_step_factor, cfg.model.grid_size,
        cfg.model.scale,
    )
    march = jax.jit(
        lambda o, d, a, b_, bf: march_rays(
            o, d, a, b_, bf,
            cascades=cfg.model.cascades, scale=cfg.model.scale,
            exp_step_factor=cfg.render.exp_step_factor,
            grid_size=cfg.model.grid_size, sample_cap=S,
        )
    )
    stages["march"] = timed_ms(
        march, rays_o, rays_d, t_start, hits[:, 1],
        state.occupancy.bitfield,
    )

    # field fwd (march + encode + MLPs + composite, as render_train)
    fwd = jax.jit(
        lambda p, bf: render_train(
            p, cfg.model, cfg.render, bf, rays_o, rays_d, k_r, S, P
        )
    )
    stages["render_fwd"] = timed_ms(fwd, state.params,
                                    state.occupancy.bitfield)

    # fwd + bwd (adds the per-level gradient scatters + MLP bwd)
    def loss_fn(p, bf):
        r = render_train(
            p, cfg.model, cfg.render, bf, rays_o, rays_d, k_r, S, P
        )
        return jnp.mean((r["rgb"] - rgb_gt) ** 2)

    grad = jax.jit(jax.grad(loss_fn))
    stages["render_fwd_bwd"] = timed_ms(grad, state.params,
                                        state.occupancy.bitfield)

    # density-grid refresh, amortized over its cadence
    from taichi_nerfs_tpu.train.step import density_grid_step

    refresh = jax.jit(
        lambda s: density_grid_step(s, cfg, warmup=False)
    )
    refresh_ms = timed_ms(refresh, state, n=5, warmup=1)
    stages["grid_refresh/16"] = refresh_ms / cfg.train.update_interval

    # measured full step (cadence included)
    n = 48
    t0 = time.perf_counter()
    for _ in range(n):
        m = trainer.run_step()
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / n * 1e3
    rays_s = B / step_ms * 1e3

    # stage sum: bwd timing includes the fwd, so the pipeline lower
    # bound is march-in-fwd + fwd_bwd + refresh share
    stage_sum = stages["render_fwd_bwd"] + stages["grid_refresh/16"]
    print("-" * 56)
    for k, v in stages.items():
        print(f"stage {k:16s} {v:8.2f} ms")
    print(
        f"stage lower bound (fwd+bwd + refresh/16): {stage_sum:8.2f} ms"
    )
    print(
        f"measured step:    {step_ms:8.2f} ms ({rays_s / 1e3:.1f}K rays/s)"
        f"  overhead ratio {step_ms / stage_sum:.2f}x"
    )
    # access arithmetic for the dominant stage at these shapes
    rows = P * layout.levels
    print(
        f"access context: {rows / 1e6:.1f}M gather rows + "
        f"{rows / 1e6:.1f}M scatter rows per step at row width "
        f"{layout.row_width * 4}B; at the measured chip rates "
        f"(~90M gather, ~58M scatter rows/s, docs/status_r3.md) the "
        f"encoder floor alone is "
        f"{rows / 90e6 * 1e3 + rows / 58e6 * 1e3:.0f} ms"
    )
    if args.json:
        rec = {
            "batch": B, "sample_cap": int(S), "pack_cap": int(P),
            "stages_ms": {k: round(v, 2) for k, v in stages.items()},
            "stage_sum_ms": round(stage_sum, 2),
            "step_ms": round(step_ms, 2),
            "rays_per_s": round(rays_s, 1),
            "overhead_ratio": round(step_ms / stage_sum, 2),
            "gather_rows": rows,
            "settled_step": int(trainer.step),
        }
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
