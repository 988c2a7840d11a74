"""Inside-camera SWR renderer fidelity oracle.

Bakes the analytic shell scene into a (R, R, R, 4) grid (sigma + albedo),
patches deferred shading to an identity (composited features ARE the
albedo), renders through ``render_swr_inside`` at full resolution, and
compares to the analytic GT image.  Isolates the *renderer's* fidelity
from both the model capacity (scripts/voxel_ceiling.py measures that:
~61 PSNR at R=256) and the optimizer.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH \
           python scripts/swr_inside_fidelity.py --img 800 --n_views 1
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="shell")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--n_views", type=int, default=1)
    ap.add_argument("--n_chunks", type=int, default=16)
    ap.add_argument("--near", type=float, default=0.1)
    ap.add_argument("--lat_cap", type=int, default=0)
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    import jax.numpy as jnp

    from taichi_nerfs_tpu.data.synthetic import (
        _VARIANTS,
        SyntheticSphereDataset,
    )
    from taichi_nerfs_tpu.models import pyramid as pyr
    from taichi_nerfs_tpu.render import swr

    scene = SyntheticSphereDataset(
        n_images=args.n_views,
        img_wh=(args.img, args.img),
        variant=args.variant,
        n_steps=512,
        split="test",
    )
    density_fn, albedo_fn = _VARIANTS[args.variant]

    R, s = args.res, 0.5
    c = (np.arange(R, dtype=np.float32) + 0.5) / R - s
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    xyz = np.stack([xx, yy, zz], axis=-1)
    grid = np.concatenate(
        [density_fn(xyz)[..., None], albedo_fn(xyz)], axis=-1
    ).astype(np.float32)
    grid = jnp.asarray(grid)

    cfg = pyr.PyramidConfig(
        resolutions=(R,), features=4, deferred=True, sigma_bias=0.0
    )
    # identity shading: the composited features are the albedo
    swr.pyr = type(pyr)("pyr_identity")
    for name in dir(pyr):
        if not name.startswith("__"):
            setattr(swr.pyr, name, getattr(pyr, name))
    swr.pyr.rgb_from_features = (
        lambda params, cfg, feats, dirs, compute_dtype=None: feats[..., :3]
    )
    params = {"rgb_mlp": {}}

    kw = {}
    if args.lat_cap:
        kw["lat_size"] = args.lat_cap
    for v in range(args.n_views):
        out = swr.render_swr_inside(
            params,
            grid,
            cfg,
            scene.poses[v],
            scene.K,
            (args.img, args.img),
            n_chunks=args.n_chunks,
            near=args.near,
            **kw,
        )
        img = np.clip(np.asarray(out["rgb"]), 0, 1)
        gt = np.asarray(scene.rays[v]).reshape(-1, 3)
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10 * np.log10(mse + 1e-12)
        print(
            f"view {v}: swr-inside fidelity psnr = {psnr:.2f} "
            f"(R={args.res}, ceiling ~61)"
        )
        if args.save:
            import imageio.v2 as imageio

            for tag, im in (("swr", img), ("gt", gt)):
                imageio.imwrite(
                    f"{args.save}_{tag}_v{v}.png",
                    (im.reshape(args.img, args.img, 3) * 255).astype(
                        np.uint8
                    ),
                )


if __name__ == "__main__":
    main()
