"""Checkpoint round-trip, deployment export, viz, and viewer tests."""

import os

import jax
import numpy as np
import pytest

from taichi_nerfs_tpu.train.state import create_train_state
from taichi_nerfs_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from taichi_nerfs_tpu.utils.export import (
    deployment_dict,
    export_aot_weights,
    load_tagged_binary,
    save_tagged_binary,
)
from taichi_nerfs_tpu.utils.viz import depth2img


def test_checkpoint_roundtrip(tmp_path, tiny_config):
    state = create_train_state(tiny_config)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, step=42)
    template = create_train_state(tiny_config, seed=99)
    restored, step = load_checkpoint(path, template)
    assert step == 42
    w0 = np.asarray(state.params["xyz_mlp"]["w0"])
    np.testing.assert_array_equal(
        np.asarray(restored.params["xyz_mlp"]["w0"]), w0
    )
    np.testing.assert_array_equal(
        np.asarray(restored.occupancy.bitfield),
        np.asarray(state.occupancy.bitfield),
    )
    # optimizer state restored too (count leaf)
    leaves_a = jax.tree_util.tree_leaves(state.opt_state)
    leaves_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tagged_binary_roundtrip(tmp_path):
    for arr in (
        np.arange(10, dtype=np.float32),
        np.arange(7, dtype=np.uint32),
        np.arange(5, dtype=np.int16),
    ):
        p = str(tmp_path / f"x_{arr.dtype}.bin")
        save_tagged_binary(p, arr)
        back = load_tagged_binary(p)
        assert back.dtype == arr.dtype
        np.testing.assert_array_equal(back, arr)
        # header layout: int32 tag + int32 count then raw LE payload
        raw = open(p, "rb").read()
        assert len(raw) == 8 + arr.nbytes


def test_deployment_export(tmp_path, tiny_config):
    state = create_train_state(tiny_config)
    poses = np.tile(
        np.concatenate([np.eye(3), [[0], [0], [-2.0]]], 1), (3, 1, 1)
    ).astype(np.float32)
    dep = deployment_dict(
        state.params, tiny_config.model, state.occupancy.bitfield, poses
    )
    cfgm = tiny_config.model
    # rgb params: hidden layers + square-padded output
    w = cfgm.rgb_net_width
    in_dim = 16 + cfgm.xyz_net_out_dim
    expect_rgb = in_dim * w + (cfgm.rgb_net_depth - 1) * w * w + w * w
    assert dep["model.rgb_net.params"].size == expect_rgb
    assert dep["model.density_bitfield"].dtype == np.uint8
    out_dir = str(tmp_path / "aot")
    export_aot_weights(dep, out_dir)
    hb = load_tagged_binary(os.path.join(out_dir, "hash_embedding.bin"))
    np.testing.assert_array_equal(hb, dep["model.hash_encoder.params"])
    bf = load_tagged_binary(os.path.join(out_dir, "density_bitfield.bin"))
    assert bf.dtype == np.uint32


def test_depth2img():
    img = depth2img(np.linspace(0, 1, 64).reshape(8, 8))
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8


def test_orbit_camera():
    from taichi_nerfs_tpu.viewer.gui import OrbitCamera

    poses = np.tile(
        np.concatenate([np.eye(3), [[0], [0], [-2.0]]], 1), (2, 1, 1)
    )
    cam = OrbitCamera(np.eye(3), (64, 48), poses, r=3.0)
    p0 = cam.pose.copy()
    assert p0.shape == (3, 4)
    cam.orbit(0.1, 0.05)
    assert not np.allclose(cam.pose, p0)
    # rotation stays orthonormal
    R = cam.rot
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    cam.scale(1.0)
    assert cam.radius < 3.0
    cam.reset(poses[1])
    np.testing.assert_allclose(cam.rot, poses[1][:3, :3])


def test_phase_timer_and_trace(tmp_path):
    """PhaseTimer accumulates per-phase wall-clock (with an optional sync
    hook) and trace() writes a jax.profiler dir; both no-op gracefully."""
    import time as _time

    import jax.numpy as jnp

    from taichi_nerfs_tpu.utils.profiling import PhaseTimer, trace

    pt = PhaseTimer()
    synced = []
    with pt.phase("a"):
        _time.sleep(0.01)
    with pt.phase("b", sync=lambda: synced.append(1)):
        pass
    assert pt.calls["a"] == 1 and pt.calls["b"] == 1
    assert pt.seconds["a"] >= 0.01
    assert synced == [1]
    s = pt.summary(reset=True)
    assert "a 1x" in s and "%" in s
    assert not pt.seconds  # reset cleared

    # trace: no-op when dir is falsy
    with trace(""):
        pass
    # real trace produces profiler artifacts
    d = tmp_path / "prof"
    with trace(str(d)):
        float(jnp.ones(8).sum())
    assert any(d.rglob("*")), "no trace artifacts written"
