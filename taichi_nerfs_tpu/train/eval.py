"""Evaluation loop: per-image PSNR/SSIM + first-view image dump.

Rebuild of the reference's test loop (``train.py:236-304``): renders every
test view with the test-time pipeline, accumulates PSNR/SSIM, and writes the
first view's rgb + turbo-colormapped depth PNGs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import Config
from ..ops.rays import get_rays
from ..render.renderer import render_image
from ..utils.viz import depth2img
from .metrics import psnr, ssim


def evaluate(
    params,
    cfg: Config,
    bitfield,
    test_dataset,
    save_dir: Optional[str] = None,
    max_images: Optional[int] = None,
    log_fn=print,
):
    w, h = test_dataset.img_wh
    n = len(test_dataset)
    if max_images is not None:
        n = min(n, max_images)
    psnrs, ssims = [], []
    for i in range(n):
        sample = test_dataset[i]
        rays_o, rays_d = get_rays(test_dataset.directions, sample["pose"])
        out = render_image(params, cfg, bitfield, rays_o, rays_d)
        if "rgb" in sample:
            gt = sample["rgb"]
            psnrs.append(float(psnr(out["rgb"], gt)))
            ssims.append(
                float(
                    ssim(
                        np.asarray(out["rgb"]).reshape(h, w, 3),
                        np.asarray(gt).reshape(h, w, 3),
                    )
                )
            )
        if i == 0 and save_dir is not None:
            import imageio.v2 as imageio

            os.makedirs(save_dir, exist_ok=True)
            rgb_img = (
                np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1) * 255
            ).astype(np.uint8)
            imageio.imsave(os.path.join(save_dir, f"rgb_{i:03d}.png"), rgb_img)
            imageio.imsave(
                os.path.join(save_dir, f"depth_{i:03d}.png"),
                depth2img(np.asarray(out["depth"]).reshape(h, w)),
            )
    if psnrs:
        log_fn(
            f"evaluation: psnr_avg={np.mean(psnrs):.4f} | "
            f"ssim_avg={np.mean(ssims):.4f}"
        )
    return {"psnr": psnrs, "ssim": ssims}
