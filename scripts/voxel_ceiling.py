"""Representational-ceiling oracle: voxelize an analytic scene at grid
resolution R, per-ray march the *voxelized* fields (trilinear), and
compare to the analytic GT image.  The result is the best PSNR any
R-resolution grid model (pyramid/SWR or otherwise) can reach on that
scene/rig — separating renderer/optimizer losses from plain resolution.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/voxel_ceiling.py \
           --variant shell --res 256 --img 800 --n_views 3
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="shell")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--n_views", type=int, default=3)
    ap.add_argument("--n_steps", type=int, default=512)
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from taichi_nerfs_tpu.data.synthetic import (
        _VARIANTS,
        SyntheticSphereDataset,
        _gt_rays,
    )

    scene = SyntheticSphereDataset(
        n_images=args.n_views,
        img_wh=(args.img, args.img),
        variant=args.variant,
        n_steps=args.n_steps,
        split="test",
    )
    density_fn, albedo_fn = _VARIANTS[args.variant]

    R, s = args.res, 0.5
    c = (np.arange(R, dtype=np.float32) + 0.5) / R - s
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    xyz = np.stack([xx, yy, zz], axis=-1)
    sigma_g = jnp.asarray(density_fn(xyz))
    albedo_g = jnp.asarray(albedo_fn(xyz))

    t0, t1 = 0.1, 2.5
    ts = jnp.linspace(t0, t1, args.n_steps, dtype=jnp.float32)
    dt = float((t1 - t0) / (args.n_steps - 1))

    def trilerp(grid, p):
        # p in [-s, s]^3 -> continuous voxel coords (centers at i+0.5)
        q = (p / (2 * s) + 0.5) * R - 0.5
        q0 = jnp.floor(q)
        f = q - q0
        i0 = jnp.clip(q0.astype(jnp.int32), 0, R - 1)
        i1 = jnp.clip(i0 + 1, 0, R - 1)
        out = 0.0
        for dx in (0, 1):
            wx = (1 - f[..., 0]) if dx == 0 else f[..., 0]
            ix = i0[..., 0] if dx == 0 else i1[..., 0]
            for dy in (0, 1):
                wy = (1 - f[..., 1]) if dy == 0 else f[..., 1]
                iy = i0[..., 1] if dy == 0 else i1[..., 1]
                for dz in (0, 1):
                    wz = (1 - f[..., 2]) if dz == 0 else f[..., 2]
                    iz = i0[..., 2] if dz == 0 else i1[..., 2]
                    w = wx * wy * wz
                    g = grid[ix, iy, iz]
                    out = out + (
                        w[..., None] * g if g.ndim > w.ndim else w * g
                    )
        return out

    @jax.jit
    def integrate(sigma_g, albedo_g, ro, rd):
        xyz = ro[:, None, :] + ts[None, :, None] * rd[:, None, :]
        inside = jnp.all(jnp.abs(xyz) <= s, axis=-1)
        sigma = trilerp(sigma_g, xyz) * inside
        alpha = 1.0 - jnp.exp(-sigma * dt)
        trans = jnp.cumprod(1.0 - alpha + 1e-12, axis=1) / (
            1.0 - alpha + 1e-12
        )
        wgt = alpha * trans
        out = jnp.einsum("rs,rsc->rc", wgt, trilerp(albedo_g, xyz))
        out += trans[:, -1:] * (1.0 - alpha[:, -1:])
        return out

    chunk = 32768
    for v in range(args.n_views):
        ro, rd = _gt_rays(scene.poses[v], scene.K, args.img, args.img)
        ro = ro.astype(np.float32)
        rd = rd.astype(np.float32)
        n = ro.shape[0]
        pad = (-n) % chunk
        ro = np.concatenate([ro, np.zeros((pad, 3), np.float32)])
        rd = np.concatenate([rd, np.ones((pad, 3), np.float32)])
        outs = [
            np.asarray(
                integrate(
                    sigma_g, albedo_g, ro[i : i + chunk], rd[i : i + chunk]
                )
            )
            for i in range(0, n + pad, chunk)
        ]
        img = np.concatenate(outs)[:n]
        gt = np.asarray(scene.rays[v]).reshape(-1, 3)
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10 * np.log10(mse + 1e-12)
        print(f"view {v}: voxel-ceiling psnr = {psnr:.2f}  (R={args.res})")
        if args.save:
            import imageio.v2 as imageio

            imageio.imwrite(
                f"{args.save}_v{v}.png",
                (
                    np.clip(img.reshape(args.img, args.img, 3), 0, 1)
                    * 255
                ).astype(np.uint8),
            )


if __name__ == "__main__":
    main()
