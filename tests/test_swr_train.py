"""End-to-end training through the shear-warp renderer (small CPU-able)."""

import jax
import numpy as np

from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
from taichi_nerfs_tpu.models.pyramid import PyramidConfig
from taichi_nerfs_tpu.train.swr_step import (
    SwrTrainConfig,
    SwrTrainer,
)


def test_swr_training_improves():
    scene = SyntheticSphereDataset(n_images=8, img_wh=(32, 32))
    mcfg = PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5
    )
    tcfg = SwrTrainConfig(
        crop=32, lr=5e-2, max_steps=40, n_chunks=4,
        sigma_l1=0.0,
    )
    trainer = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )
    first = None
    m = None
    for _ in range(40):
        m = trainer.run_step()
        if first is None:
            first = float(jax.device_get(m["loss"]))
    last_psnr = float(jax.device_get(m["psnr"]))
    first_psnr = -10 * np.log10(first)
    assert last_psnr > first_psnr + 4, (
        f"no learning: {first_psnr:.2f} -> {last_psnr:.2f}"
    )

    # full-image render through the host wrapper
    out = trainer.render(scene.poses[0])
    rgb = np.asarray(out["rgb"]).reshape(32, 32, 3)
    gt = np.asarray(scene.rays[0]).reshape(32, 32, 3)
    mse = float(np.mean((rgb - gt) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 14, f"render far from gt: {psnr:.2f}"


def test_swr_training_with_distortion_loss():
    """--distortion_loss_w wiring: the step runs, the loss stays finite,
    and training still learns with the regularizer on."""
    scene = SyntheticSphereDataset(n_images=4, img_wh=(32, 32))
    mcfg = PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5
    )
    tcfg = SwrTrainConfig(
        crop=32, lr=5e-2, max_steps=30, n_chunks=4,
        sigma_l1=0.0, distortion_w=1e-2,
    )
    trainer = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )
    first = None
    m = None
    for _ in range(30):
        m = trainer.run_step()
        if first is None:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    assert np.isfinite(last)
    assert last < first, f"no learning with distortion on: {first} -> {last}"
