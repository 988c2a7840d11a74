"""End-to-end slice: train on the procedural sphere scene, render, score.

This is the framework's analogue of the reference's empirical verification
(SURVEY §4): train-loop telemetry must improve, and a held-out view rendered
by the *test-time* pipeline must match the analytic ground truth.
"""

import jax
import numpy as np
import pytest

from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
from taichi_nerfs_tpu.render import render_image
from taichi_nerfs_tpu.train import Trainer
from taichi_nerfs_tpu.train.metrics import psnr, ssim


@pytest.fixture(scope="module")
def scene():
    return SyntheticSphereDataset(n_images=12, img_wh=(48, 48))


@pytest.fixture(scope="module")
def trained(scene, tiny_config):
    from taichi_nerfs_tpu.utils.profiling import PhaseTimer

    trainer = Trainer(
        tiny_config,
        scene.as_batch(),
        scene.K,
        scene.img_wh,
        log_fn=lambda *_: None,
    )
    trainer.timer = PhaseTimer()  # --profile_dir wiring (loop phases)
    first = None
    for _ in range(300):
        m = trainer.run_step()
        if first is None:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    return trainer, first, last


def test_loss_decreases(trained):
    _, first, last = trained
    assert last < first * 0.5, (first, last)


def test_phase_timer_attributed(trained):
    """--profile_dir's phase accounting: both loop phases were timed."""
    trainer, _, _ = trained
    assert trainer.timer.calls["train_step"] == 300
    assert trainer.timer.calls["grid_update"] > 0
    assert trainer.timer.seconds["train_step"] > 0
    s = trainer.timer.summary()
    assert "train_step" in s and "grid_update" in s


def test_render_matches_ground_truth(trained, scene, tiny_config):
    trainer, _, _ = trained
    test_scene = SyntheticSphereDataset(
        split="test", n_images=2, img_wh=(48, 48)
    )
    from taichi_nerfs_tpu.ops.rays import get_rays

    pose = test_scene.poses[0]
    rays_o, rays_d = get_rays(test_scene.directions, pose)
    out = render_image(
        trainer.state.params,
        tiny_config,
        trainer.state.occupancy.bitfield,
        rays_o,
        rays_d,
        chunk=48 * 48,
    )
    gt = test_scene.rays[0]
    p = float(psnr(out["rgb"], gt))
    assert p > 17.0, f"test-view PSNR too low: {p:.2f}"
    # SSIM sanity on the reshaped image
    h, w = 48, 48
    s = float(
        ssim(out["rgb"].reshape(h, w, 3), gt.reshape(h, w, 3))
    )
    assert s > 0.5, f"test-view SSIM too low: {s:.3f}"
    # opacity: sphere core opaque, background transparent
    opacity = np.asarray(out["opacity"]).reshape(h, w)
    assert opacity[h // 2, w // 2] > 0.8
    assert opacity[0, 0] < 0.2
