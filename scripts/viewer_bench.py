"""End-to-end interactive viewer fps on the chip (VERDICT r4 item 8).

Drives the ACTUAL viewer loop (``NGPGUI.render`` headless orbit —
camera moves every frame, chip renders, host receives the displayable
frame), not an isolated render microbench.  The render_fn is the
capped Pallas/shear-warp path with the lattice cap as the interactive
knob (``--lat_cap``); frames are quantized to uint8 ON DEVICE so the
tunnel ships 640 KB instead of 7.7 MB per 800^2 frame.

Reference counterpart: the GUI renders live full-resolution frames per
orbit event (``/root/reference/gui.py:115-145``).

Usage:
    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/viewer_bench.py \
        [--ckpt results/model_pyramid.npz] [--res 800] [--frames 24] \
        [--lat_cap auto|none|<int>] [--kind cubic]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results/model_pyramid.npz")
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--lat_cap", default="auto")
    ap.add_argument("--kind", default="cubic",
                    help="resample kind the checkpoint was trained with")
    ap.add_argument("--early_exit", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr
    from taichi_nerfs_tpu.viewer.gui import NGPGUI

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
    grid = pyr.bake_jit(params, cfg)
    if args.lat_cap == "auto":
        lat = int(1.25 * cfg.grid_res) + 16
    elif args.lat_cap in ("none", "0"):
        lat = 0
    else:
        lat = int(args.lat_cap)

    w = h = args.res
    K = np.float32([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]])
    ds = SyntheticSphereDataset(
        f"synthetic://lego?views=4&res={args.res}", split="test"
    )

    def render_fn(pose, K_, wh):
        out = render_swr(
            params, grid, cfg, jnp.asarray(pose), jnp.asarray(K),
            (w, h), lat_cap=lat or None, early_exit=args.early_exit,
            resample_kind=args.kind,
        )
        # device-side uint8 quantize: the viewer displays this directly
        rgb8 = (jnp.clip(out["rgb"], 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return {"rgb": rgb8, "depth": out["depth"]}

    gui = NGPGUI(
        None, params, None, K, (w, h), np.asarray(ds.poses),
        render_fn=render_fn,
    )
    # warm the per-(axis, flip) programs before timing: orbit crosses
    # axis buckets, and a compile inside the timed loop is not fps
    for _ in range(6):
        gui.cam.orbit(1.1, 0.35)
        gui.render_frame()
    t0 = time.time()
    frames = gui.render(max_frames=args.frames)
    wall = time.time() - t0
    fps = len(frames) / wall
    print(
        f"VIEWER: {len(frames)} frames in {wall:.2f}s = {fps:.1f} fps "
        f"(res {w}x{h}, lat_cap {lat or 'uncapped'}, kind {args.kind}, "
        f"backend {jax.default_backend()})"
    )


if __name__ == "__main__":
    main()
