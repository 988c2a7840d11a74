"""Diagnose the round-5 R=512 quality regression (status_r5.md).

Renders the same held-out views from the R=256 CLI-record checkpoint and
the R=512-lean checkpoint, writes rgb + |error| heatmaps side by side,
and splits eval MSE into silhouette-edge vs interior bands (the round-4
plateau analysis attributed ~80% of MSE to edge error — this tells us
whether the fine level is losing on edges (reconstruction/ringing) or in
the interior (noise / bf16-bake quantization)).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/diag_r512.py \
          [--views 2,13] [--out /tmp/diag_r512]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_ckpt(path):
    import jax.numpy as jnp

    from taichi_nerfs_tpu.models.pyramid import PyramidConfig

    d = np.load(path)
    levels = []
    i = 0
    while f"level_{i}" in d:
        levels.append(jnp.asarray(d[f"level_{i}"]))
        i += 1
    params = {
        "levels": levels,
        "rgb_mlp": {
            k[len("rgb_mlp_"):]: jnp.asarray(d[k])
            for k in d.files if k.startswith("rgb_mlp_")
        },
    }
    feats = int(levels[0].shape[-1])
    lf = tuple(int(g.shape[-1]) for g in levels)
    cfg = PyramidConfig(
        resolutions=tuple(int(g.shape[0]) for g in levels),
        features=feats, deferred=True,
        level_features=lf if any(f != feats for f in lf) else (),
    )
    return params, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="results/model_pyramid.npz")
    ap.add_argument("--b",
                    default="results/lego_proxy_r512/model_pyramid.npz")
    ap.add_argument("--views", default="2,13")
    ap.add_argument("--out", default="/tmp/diag_r512")
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render.swr import render_swr
    from taichi_nerfs_tpu.train.metrics import psnr as psnr_fn

    os.makedirs(args.out, exist_ok=True)
    test = SyntheticSphereDataset(
        "synthetic://lego?views=100&res=800", split="test"
    )
    w, h = test.img_wh

    for tag, path in (("a", args.a), ("b", args.b)):
        params, cfg = load_ckpt(path)
        grid = pyr.bake_jit(params, cfg, dtype=jnp.bfloat16)
        for vi in [int(x) for x in args.views.split(",")]:
            s = test[vi]
            out = render_swr(
                params, grid, cfg, np.asarray(s["pose"]), test.K,
                (w, h), lat_cap=None, skip_empty=False,
                resample_kind="cubic", early_exit=1e-4,
            )
            rgb = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
            gt = np.asarray(s["rgb"]).reshape(h, w, 3)
            err = np.abs(rgb - gt).mean(-1)
            # edge band: pixels near a GT alpha/intensity gradient
            gray = gt.mean(-1)
            gy, gx = np.gradient(gray)
            edge = (np.hypot(gx, gy) > 0.05)
            # dilate the edge band by ~2 px
            for _ in range(2):
                e = edge.copy()
                e[1:] |= edge[:-1]; e[:-1] |= edge[1:]
                e[:, 1:] |= edge[:, :-1]; e[:, :-1] |= edge[:, 1:]
                edge = e
            mse = float(((rgb - gt) ** 2).mean())
            mse_edge = float(((rgb - gt)[edge] ** 2).mean())
            mse_int = float(((rgb - gt)[~edge] ** 2).mean())
            p = float(psnr_fn(rgb.reshape(-1, 3), gt.reshape(-1, 3)))
            print(
                f"{tag} view {vi}: psnr={p:.2f} mse={mse:.2e} "
                f"edge_mse={mse_edge:.2e} ({edge.mean():.0%} px) "
                f"interior_mse={mse_int:.2e}",
                flush=True,
            )
            imageio.imsave(
                os.path.join(args.out, f"{tag}_v{vi}_rgb.png"),
                (rgb * 255).astype(np.uint8),
            )
            imageio.imsave(
                os.path.join(args.out, f"{tag}_v{vi}_err.png"),
                (np.clip(err * 8, 0, 1) * 255).astype(np.uint8),
            )


if __name__ == "__main__":
    main()
