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


def test_swr_quality_floor_cpu():
    """CPU-scale sibling of the TPU quality-floor test: the record
    protocol (cubic resampling, alpha supervision, random backgrounds,
    tv 5e-4 — docs/records/*.manifest.json) at reduced scale, with a
    held-out eval floor.  Guards the record recipe against silent
    quality regressions (the round-2 28.1 -> 25.9 episode) inside the
    default suite, where the tpu+slow-marked floor test cannot run.
    Calibrated mean over 2 held-out views: 19.3 dB (floor 2 dB below)."""
    from taichi_nerfs_tpu.train.metrics import psnr as psnr_fn

    spec = "synthetic://lego?views=16&res=64"
    tr_ds = SyntheticSphereDataset(spec, split="train")
    mcfg = PyramidConfig(resolutions=(16, 32), features=8, deferred=True)
    tcfg = SwrTrainConfig(
        crop=64, lr=2e-2, max_steps=300, n_chunks=8,
        tv_w=5e-4, alpha_w=0.2, random_bg=True, resample_kind="cubic",
    )
    trainer = SwrTrainer(
        mcfg, tcfg, tr_ds.rays, tr_ds.poses, tr_ds.K, tr_ds.img_wh,
        alphas=tr_ds.alphas,
    )
    for _ in range(300):
        trainer.run_step()
    te = SyntheticSphereDataset(spec, split="test")
    w, h = te.img_wh
    ps = []
    for i in range(2):
        s = te[i]
        out = trainer.render(s["pose"], K=None, img_wh=(w, h))
        ps.append(
            float(psnr_fn(np.asarray(out["rgb"]), np.asarray(s["rgb"])))
        )
    mean = float(np.mean(ps))
    assert np.all(np.isfinite(ps)), ps
    assert mean > 17.3, f"quality floor breached: {ps} (mean {mean:.2f})"


def test_swr_progressive_training():
    """Coarse-to-fine (prog_steps): phases advance, shared params/adam
    moments carry across growth, and training still learns."""
    scene = SyntheticSphereDataset(n_images=4, img_wh=(32, 32))
    mcfg = PyramidConfig(
        resolutions=(8, 16, 32), features=4, rgb_width=16, scale=0.5
    )
    tcfg = SwrTrainConfig(
        crop=32, lr=5e-2, max_steps=40, n_chunks=4,
        sigma_l1=0.0, prog_steps=(8, 8),
    )
    trainer = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )
    assert len(trainer.state.params["levels"]) == 1
    first = None
    m = None
    seen_levels = set()
    for _ in range(40):
        m = trainer.run_step()
        seen_levels.add(len(trainer.state.params["levels"]))
        if first is None:
            first = float(jax.device_get(m["loss"]))
    assert seen_levels == {1, 2, 3}
    # adam count carried: one schedule spans all phases
    assert int(trainer.state.opt_state[0].count) == 40
    last_psnr = float(jax.device_get(m["psnr"]))
    first_psnr = -10 * np.log10(first)
    assert last_psnr > first_psnr + 4, (
        f"no learning: {first_psnr:.2f} -> {last_psnr:.2f}"
    )
    out = trainer.render(scene.poses[0])
    assert np.isfinite(np.asarray(out["rgb"])).all()


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


def test_swr_training_inside_cameras():
    """Cameras inside the grid train through the cubemap-face sweep with
    a face-masked loss; the run learns and renders finitely."""
    from taichi_nerfs_tpu.data.synthetic import look_at, render_gt_image

    scene = SyntheticSphereDataset(n_images=1, img_wh=(32, 32))
    # rebuild the rig with cameras *inside* the [-s, s]^3 cube pointing
    # outward at the sphere surface (scale 0.5, sphere radius ~0.3)
    rng = np.random.RandomState(3)
    poses, rays = [], []
    for k in range(6):
        th = 2 * np.pi * k / 6
        eye = 0.12 * np.array([np.cos(th), np.sin(th), 0.3 * rng.randn()])
        tgt = 0.45 * np.array([np.cos(th), np.sin(th), 0.0])
        c2w = look_at(eye, tgt, np.array([0.0, 0.0, 1.0]))
        poses.append(c2w)
        rays.append(render_gt_image(c2w, scene.K, 32, 32, n_steps=128))
    scene.poses = np.stack(poses).astype(np.float32)
    scene.rays = np.stack(rays)

    mcfg = PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5
    )
    # random_bg: required for enclosed scenes — a fixed background
    # saturates the color net black before opacity forms (the
    # transparent-model shortcut) and renders come out grayscale
    # 120 steps: chroma develops after opacity forms (measured on this
    # scene: step 30 chroma 5e-4 / opac 0.14, step 120 chroma 0.25 /
    # opac 0.77 / 20.4 PSNR) — asserting earlier flakes
    tcfg = SwrTrainConfig(
        crop=32, lr=5e-2, max_steps=120, n_chunks=4, sigma_l1=0.0,
        random_bg=True, cam_carve=0.1,
    )
    trainer = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )
    assert all(trainer._inside)
    assert trainer.sigma_keep is not None
    assert float(np.asarray(trainer.sigma_keep).mean()) < 1.0
    first = None
    m = None
    for _ in range(120):
        m = trainer.run_step()
        if first is None:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    assert np.isfinite(last)
    assert last < first, f"no learning inside: {first} -> {last}"
    out = trainer.render(scene.poses[0])
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    # color-collapse regression: the render must not be grayscale (the
    # GT sphere is strongly colored, chroma 0.20); chroma = per-pixel
    # channel spread.  Without random_bg the color net saturates black
    # and chroma stays ~1e-4 forever
    chroma = float((rgb.max(-1) - rgb.min(-1)).mean())
    assert chroma > 0.05, f"grayscale render (color net collapsed): {chroma}"


def test_swr_checkpoint_roundtrip(tmp_path):
    """model_pyramid.npz save -> SwrTrainer.load_npz restores params
    (the pyramid path's --ckpt_path), including under a prog schedule."""
    scene = SyntheticSphereDataset(n_images=2, img_wh=(32, 32))
    mcfg = PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5
    )
    tcfg = SwrTrainConfig(
        crop=32, lr=5e-2, max_steps=10, n_chunks=4, prog_steps=(3,)
    )
    tr = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )
    for _ in range(10):
        tr.run_step()
    flat = jax.device_get(tr.state.params)
    p = tmp_path / "model_pyramid.npz"
    np.savez(
        p,
        **{f"level_{i}": g for i, g in enumerate(flat["levels"])},
        **{f"rgb_mlp_{k}": v for k, v in flat["rgb_mlp"].items()},
    )

    tr2 = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh
    )
    assert len(tr2.state.params["levels"]) == 1  # phase 0 (truncated)
    tr2.load_npz(str(p))
    assert len(tr2.state.params["levels"]) == 2  # jumped to full depth
    for a, b in zip(tr2.state.params["levels"], flat["levels"]):
        np.testing.assert_array_equal(np.asarray(a), b)
    a = tr.render(scene.poses[0])
    b = tr2.render(scene.poses[0])
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-6
    )


def test_swr_alpha_supervision():
    """GT alpha channel wiring: with alphas= the trainer packs RGBA,
    random_bg re-composites GT over the random background, and alpha_w
    drives rendered opacity toward the GT silhouette (floater carving,
    reference rendering.py:219-226 --random_bg semantics extended with
    the alpha the reference blends away at load)."""
    scene = SyntheticSphereDataset(n_images=8, img_wh=(32, 32))
    assert scene.alphas.shape == scene.rays.shape[:2]
    assert 0.05 < scene.alphas.mean() < 0.95  # silhouette, not constant
    mcfg = PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5
    )
    tcfg = SwrTrainConfig(
        crop=32, lr=5e-2, max_steps=60, n_chunks=4, sigma_l1=0.0,
        random_bg=True, alpha_w=0.1,
    )
    trainer = SwrTrainer(
        mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh,
        alphas=scene.alphas,
    )
    assert trainer.images.shape[-1] == 4  # RGBA packed on device
    first = None
    m = None
    for _ in range(60):
        m = trainer.run_step()
        if first is None:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    assert np.isfinite(last)
    assert last < first, f"no learning with alpha_w: {first} -> {last}"
    # the rendered opacity should track the GT silhouette: empty-ray
    # pixels (alpha 0) must stay near-transparent
    out = trainer.render(scene.poses[0])
    opac = np.asarray(out["opacity"]).reshape(-1)
    gt_a = np.asarray(scene.alphas[0])
    empty = gt_a < 0.05
    assert empty.any()
    assert float(opac[empty].mean()) < 0.25, (
        f"empty rays opaque: {opac[empty].mean():.3f}"
    )


def test_camera_keep_mask_oracle():
    """camera_keep_mask zeroes exactly the voxels within the carve radius
    of some training camera (voxel centers, world coords)."""
    from taichi_nerfs_tpu.train.swr_step import camera_keep_mask

    res, scale, carve = 16, 0.5, 0.13
    poses = np.zeros((2, 3, 4), np.float32)
    poses[0, :, 3] = [0.1, -0.05, 0.2]
    poses[1, :, 3] = [-0.3, 0.0, -0.1]
    keep = camera_keep_mask(poses, res, carve, scale)
    assert keep.shape == (res, res, res)
    c = (np.arange(res) + 0.5) / res - scale
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx, yy, zz], -1)
    want = np.ones((res, res, res))
    for p in poses:
        want *= (((pts - p[:, 3]) ** 2).sum(-1) > carve**2)
    np.testing.assert_array_equal(keep, want)
    assert 0.0 < keep.mean() < 1.0  # carves something, not everything


def test_apply_sigma_keep_shapes():
    """apply_sigma_keep zeroes only the sigma channel, both grid forms."""
    import jax.numpy as jnp

    from taichi_nerfs_tpu.train.swr_step import apply_sigma_keep

    rng = np.random.RandomState(0)
    keep = jnp.asarray((rng.rand(4, 4, 4) > 0.5).astype(np.float32))
    # fused form: (R, R, R, 1+F)
    g = jnp.asarray(rng.rand(4, 4, 4, 5).astype(np.float32))
    out = np.asarray(apply_sigma_keep(g, keep))
    np.testing.assert_allclose(
        out[..., 0], np.asarray(g[..., 0]) * np.asarray(keep)
    )
    np.testing.assert_array_equal(out[..., 1:], np.asarray(g[..., 1:]))
    # split form: (sigma, feats) tuple
    sig = jnp.asarray(rng.rand(4, 4, 4).astype(np.float32))
    feats = jnp.asarray(rng.rand(4, 4, 4, 4).astype(np.float32))
    s2, f2 = apply_sigma_keep((sig, feats), keep)
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(sig) * np.asarray(keep)
    )
    np.testing.assert_array_equal(np.asarray(f2), np.asarray(feats))


def test_swr_trainer_save_load_state(tmp_path):
    """Light checkpoint/resume: params round-trip (bf16), phase + step +
    crop-rng restored, cosine schedule fast-forwarded, training
    continues."""
    import jax
    import jax.numpy as jnp

    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.models.pyramid import PyramidConfig
    from taichi_nerfs_tpu.train.swr_step import SwrTrainConfig, SwrTrainer

    scene = SyntheticSphereDataset(n_images=2, img_wh=(32, 32))
    mcfg = PyramidConfig(resolutions=(4, 8), features=4, rgb_width=8,
                         rgb_depth=1, deferred=True)
    tcfg = SwrTrainConfig(crop=16, max_steps=40, n_chunks=2,
                          prog_steps=(4,))
    tr = SwrTrainer(mcfg, tcfg, scene.rays, scene.poses, scene.K,
                    scene.img_wh)
    for _ in range(8):  # crosses the phase boundary at step 4
        m = tr.run_step()
    path = str(tmp_path / "state.pkl")
    tr.save_state(path)

    tr2 = SwrTrainer(mcfg, tcfg, scene.rays, scene.poses, scene.K,
                     scene.img_wh)
    tr2.load_state(path)
    assert tr2.step == tr.step
    assert tr2._phase_idx == tr._phase_idx
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.params),
        jax.tree_util.tree_leaves(tr2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(jnp.asarray(b, jnp.float32)),
            rtol=1e-2, atol=1e-2,  # bf16 round-trip
        )
    # schedule count fast-forwarded; adam count fresh
    sched = [o for o in tr2.state.opt_state
             if hasattr(o, "count") and not hasattr(o, "mu")]
    assert sched and int(sched[0].count) == tr.step
    m2 = tr2.run_step()
    assert np.isfinite(float(m2["loss"]))
