"""Interactive/eval rendering rate of a trained pyramid (VERDICT r2 item 5).

Times full-frame renders at the given resolution, capped (the 1.25R
interactive lattice) and uncapped (true per-pixel lattice — the quality
eval path).  Target: >= 30 fps at 800x800 (BASELINE.md:32).

    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/eval_fps.py \
        --ckpt results/model_pyramid.npz --res 800 [--frames 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results/model_pyramid.npz")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--sweep_impl", default="auto")
    ap.add_argument("--early_exit", type=float, default=0.0,
                    help="transmittance threshold for chunk-level early "
                         "termination (reference T_threshold semantics; "
                         "0 = exact full sweep)")
    ap.add_argument("--resample_kind", default="linear",
                    choices=("linear", "cubic"),
                    help="slab/fold reconstruction kernel — must match "
                         "the checkpoint's training kind (the record "
                         "trains cubic)")
    ap.add_argument("--resample_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="resample matmul operand dtype (bfloat16 = the "
                         "MXU-rate eval leg, VERDICT r4 item 2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr

    d = np.load(args.ckpt)
    levels = []
    i = 0
    while f"level_{i}" in d:
        levels.append(jnp.asarray(d[f"level_{i}"]))
        i += 1
    params = {
        "levels": levels,
        "rgb_mlp": {
            k[len("rgb_mlp_"):]: jnp.asarray(d[k])
            for k in d.files
            if k.startswith("rgb_mlp_")
        },
    }
    feats = int(levels[0].shape[-1])
    lf = tuple(int(g.shape[-1]) for g in levels)
    cfg = pyr.PyramidConfig(
        resolutions=tuple(int(g.shape[0]) for g in levels),
        features=feats,
        deferred=True,
        level_features=lf if any(f != feats for f in lf) else (),
    )
    R = cfg.grid_res
    grid = pyr.bake_jit(params, cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(grid)

    w = h = args.res
    K = np.float32([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]])

    def pose_at(deg):
        a = np.radians(deg)
        Rm = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
             [-np.sin(a), 0, np.cos(a)]], np.float32,
        )
        base = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        t = Rm @ np.array([0, 0, 1.6], np.float32)
        return np.concatenate([Rm @ base, t[:, None]], axis=1)

    ee = args.early_exit
    for name, cap in (("capped(1.25R)", int(1.25 * R) + 16),
                      ("uncapped", None)):
        # warm the (axis, flip) programs on the orbit
        out = None
        for f in range(4):
            out = render_swr(
                params, grid, cfg, pose_at(90.0 * f), K, (w, h),
                lat_cap=cap, skip_empty=False,
                sweep_impl=args.sweep_impl, early_exit=ee,
                resample_kind=args.resample_kind,
                resample_dtype=args.resample_dtype,
            )
        float(jnp.sum(out["rgb"][:1]))
        t0 = time.perf_counter()
        for f in range(args.frames):
            out = render_swr(
                params, grid, cfg, pose_at(90.0 * (f % 4)), K, (w, h),
                lat_cap=cap, skip_empty=False,
                sweep_impl=args.sweep_impl, early_exit=ee,
                resample_kind=args.resample_kind,
                resample_dtype=args.resample_dtype,
            )
        float(jnp.sum(out["rgb"][:1]))
        ms = (time.perf_counter() - t0) / args.frames * 1e3
        print(
            f"R={R} {w}x{h} {name}: {ms:.1f} ms/frame "
            f"({1e3 / ms:.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
