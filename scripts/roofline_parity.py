"""Brick parity-path roofline: measured chip floors vs the real step.

Round-3 verdict item 5: "commit a measured chip-ceiling analysis for the
brick parity path (rows/s gather + scatter + sort/top_k budget at batch
8192) ... Done = recorded steady state >= 3x today's claim OR a committed
roofline proving the pipeline is within ~1.5x of access-bound."

Method: settle the real trainer to steady state (grid sparsified, caps
stable), read the settled shapes (sample cap S, pack P, brick layout),
then microbenchmark each irreducible primitive AT THOSE SHAPES on the
chip:

* gather floor  — one (P*L)-row gather of 8F-wide bricks (encoder fwd,
  ops/brick_encoder.py layout: one row per (sample, level));
* scatter floor — per-level scatter-add of the same rows (encoder bwd);
* march floor   — the boundary-merge sort + per-cell occupancy probes at
  the marcher's settled shapes (ops/marching.py interval path);
* MLP floor     — the xyz/rgb MLP matmul chain at (P, .) (MXU-bound);
* stream floor  — dense-level brick materialization + compositor scans,
  bounded by measured HBM copy bandwidth at the same footprint.

The sum of floors is the access-bound ceiling; the script prints each
floor, the measured full step, and the ratio.  Reference behavior
anchor: modules/ray_march.py:8-194 + hash_encoder.py:14-145 (the same
pipeline stages, CUDA layout).

Usage:
    PYTHONPATH="/root/repo:$PYTHONPATH" timeout 580 \
        python scripts/roofline_parity.py [--json docs/roofline.json]
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
    ap.add_argument("--settle_steps", type=int, default=60)
    args = ap.parse_args()

    from taichi_nerfs_tpu.config import config_for_scene
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.ops.brick_encoder import build_brick_layout
    from taichi_nerfs_tpu.train.loop import Trainer

    cfg = config_for_scene(0.5)  # the bench's parity config (brick)
    scene = SyntheticSphereDataset(
        n_images=8, img_wh=(256, 256), variant="checker", n_steps=256
    )
    trainer = Trainer(
        cfg, scene.as_batch(), scene.K, scene.img_wh,
        log_fn=lambda *a, **k: None,
    )
    m = None
    for _ in range(args.settle_steps):
        m = trainer.run_step()
    mm = {k: float(v) for k, v in m.items()}
    B = cfg.train.batch_size
    S, P = trainer.sample_cap, trainer.pack_cap
    layout = build_brick_layout(cfg.model.brick)
    L, F = layout.levels, layout.F
    W = layout.row_width  # 8F
    rows_total = layout.n_rows
    print(
        f"settled: batch={B} sample_cap={S} pack_cap={P} "
        f"levels={L} F={F} brick_rows={rows_total} rm_s={mm.get('rm_s', -1):.1f}"
    )

    key = jax.random.PRNGKey(0)
    floors = {}

    # --- gather floor: P*L rows of width 8F from the brick table -------
    table = jax.random.normal(key, (rows_total, W), jnp.float32)
    idx = jax.random.randint(key, (P * L,), 0, rows_total)

    def g(t, i):
        return jnp.take(t, i, axis=0)

    ms = timed_ms(jax.jit(g), table, idx)
    floors["gather"] = ms
    print(
        f"gather  {P * L} rows x {W}w: {ms:7.2f} ms "
        f"({P * L / ms / 1e3:.0f} M rows/s)"
    )

    # --- scatter floor: same rows, per-level tables (encoder bwd) ------
    per_lv = [
        jax.random.randint(key, (P,), 0, max(r, 1))
        for r in layout.rows
    ]
    upd = jax.random.normal(key, (P, W), jnp.float32)

    def sc(tabs, ids, u):
        return [
            t.at[i].add(u) for t, i in zip(tabs, ids)
        ]

    tabs = [
        jnp.zeros((max(r, 1), W), jnp.float32) for r in layout.rows
    ]
    ms = timed_ms(jax.jit(sc), tabs, per_lv, upd)
    floors["scatter"] = ms
    print(
        f"scatter {P * L} rows x {W}w (per-level): {ms:7.2f} ms "
        f"({P * L / ms / 1e3:.0f} M rows/s)"
    )

    # --- march floor: lane sort of merged boundaries + occupancy probes
    # interval marcher: 3 arithmetic sequences -> one sort over ~3R
    # candidates per ray, then one uint8 bitfield probe per crossed cell
    R = cfg.model.grid_size
    n_cand = 3 * R
    seqs = jax.random.uniform(key, (B, n_cand), jnp.float32)
    ms_sort = timed_ms(jax.jit(lambda x: jnp.sort(x, axis=-1)), seqs)
    bf = jnp.zeros((cfg.model.cascades * R * R * R // 8,), jnp.uint8)
    probe_idx = jax.random.randint(key, (B * n_cand,), 0, bf.shape[0])
    ms_probe = timed_ms(
        jax.jit(lambda b, i: jnp.take(b, i, axis=0)), bf, probe_idx
    )
    floors["march"] = ms_sort + ms_probe
    print(
        f"march   sort (B x {n_cand}): {ms_sort:7.2f} ms + probes: "
        f"{ms_probe:7.2f} ms"
    )

    # --- MLP floor: xyz (out 16) + rgb chain at (P, .), bf16 MXU -------
    xw = cfg.model.xyz_net_width
    x = jax.random.normal(key, (P, L * F), jnp.bfloat16)
    w1 = jax.random.normal(key, (L * F, xw), jnp.bfloat16)
    w2 = jax.random.normal(key, (xw, 16), jnp.bfloat16)
    rw = cfg.model.rgb_net_width
    r0 = jax.random.normal(key, (32, rw), jnp.bfloat16)
    r1 = jax.random.normal(key, (rw, rw), jnp.bfloat16)
    r2 = jax.random.normal(key, (rw, 3), jnp.bfloat16)

    def mlps(x, w1, w2, r0, r1, r2):
        h = jnp.maximum(x @ w1, 0) @ w2
        d = jnp.concatenate([h, h], axis=-1)
        return jnp.maximum(jnp.maximum(d @ r0, 0) @ r1, 0) @ r2

    ms = timed_ms(jax.jit(mlps), x, w1, w2, r0, r1, r2)
    floors["mlp_fwd"] = ms
    floors["mlp_bwd"] = 2.0 * ms  # bwd ~ 2x fwd FLOPs on the same MXU path
    print(f"mlp fwd (P={P}): {ms:7.2f} ms (bwd floor 2x)")

    # --- stream floor: dense-brick materialization + compositor scans --
    n_dense_rows = sum(
        r for r, d in zip(layout.rows, layout.dense) if d
    )
    stream_bytes = (
        n_dense_rows * W * 4 * 2  # materialize: read corners+write bricks
        + P * 8 * 4 * 3  # compositor: sigma/rgb/weights passes
    )
    big = jnp.zeros((max(stream_bytes // 4, 1),), jnp.float32)
    ms_copy = timed_ms(jax.jit(lambda v: v + 1.0), big)
    floors["stream"] = ms_copy
    print(
        f"stream  {stream_bytes / 1e6:.0f} MB @ copy rate: "
        f"{ms_copy:7.2f} ms"
    )

    # --- measured full step -------------------------------------------
    n = 40
    t0 = time.perf_counter()
    for _ in range(n):
        m = trainer.run_step()
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / n * 1e3
    total_floor = sum(floors.values())
    rays_s = B / step_ms * 1e3
    ceil_rays_s = B / total_floor * 1e3
    print("-" * 56)
    for k, v in floors.items():
        print(f"floor {k:10s} {v:7.2f} ms")
    print(
        f"access-bound floor:  {total_floor:7.2f} ms "
        f"({ceil_rays_s / 1e3:.0f}K rays/s ceiling)"
    )
    print(
        f"measured step:       {step_ms:7.2f} ms "
        f"({rays_s / 1e3:.0f}K rays/s)  ratio {step_ms / total_floor:.2f}x"
    )
    if args.json:
        rec = {
            "batch": B, "sample_cap": S, "pack_cap": P,
            "floors_ms": {k: round(v, 2) for k, v in floors.items()},
            "floor_total_ms": round(total_floor, 2),
            "step_ms": round(step_ms, 2),
            "rays_per_s": round(rays_s, 1),
            "ceiling_rays_per_s": round(ceil_rays_s, 1),
            "ratio": round(step_ms / total_floor, 2),
        }
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
