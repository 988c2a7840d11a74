"""Multi-chip sharding tests on a virtual 8-device CPU mesh (subprocess:
the parent process may already hold a single-TPU backend)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cpu(code: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    # this image's jax plugin ignores the env var; force via config too
    prelude = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    )
    return subprocess.run(
        [sys.executable, "-c", prelude + code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    res = _run_cpu(
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ok" in res.stdout


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """Loss from an 8-way sharded step is finite and params stay replicated."""
    code = """
import jax, numpy as np
import jax.numpy as jnp
from taichi_nerfs_tpu.parallel import make_mesh, make_sharded_train_step, shard_state, shard_batch
from taichi_nerfs_tpu.train.state import create_train_state
from taichi_nerfs_tpu.train.step import Batch
from taichi_nerfs_tpu.config import Config, ModelConfig, HashGridConfig, RenderConfig, TrainConfig

cfg = Config(
    model=ModelConfig(scale=0.5,
        grid=HashGridConfig(levels=4, feature_per_level=2, log2_T=10, base_res=4, max_res=32),
        grid_size=32, xyz_net_width=16, rgb_net_width=16, mlp_dtype="float32"),
    render=RenderConfig(train_sample_cap=32),
    train=TrainConfig(batch_size=64),
)
mesh = make_mesh(8)
state = shard_state(create_train_state(cfg), mesh)
rng = np.random.RandomState(0)
data = shard_batch(Batch(
    rays=jnp.asarray(rng.uniform(0, 1, (3, 64, 3)), jnp.float32),
    poses=jnp.asarray(np.stack([np.concatenate([np.eye(3), [[0],[0],[-1.5]]], 1)]*3), jnp.float32),
    directions=jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)) + [0,0,1], jnp.float32),
), mesh)
step = make_sharded_train_step(cfg, mesh, sample_cap=32)
state, metrics = step(state, data)
assert np.isfinite(float(metrics["loss"]))
# params remain identical across devices (replicated)
p = state.params["xyz_mlp"]["w0"]
shards = [np.asarray(s.data) for s in p.addressable_shards]
for s in shards[1:]:
    np.testing.assert_array_equal(shards[0], s)
print("sharded-ok")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "sharded-ok" in res.stdout


@pytest.mark.slow
def test_swr_sharded_step():
    """Crop-parallel SWR step on 8 virtual devices: finite loss, params
    replicated, and the pmean'd grads move params identically."""
    code = """
import dataclasses
import jax, numpy as np
import jax.numpy as jnp
from taichi_nerfs_tpu.models.pyramid import PyramidConfig
from taichi_nerfs_tpu.parallel import (
    make_mesh, make_swr_sharded_step, shard_swr_batch, shard_swr_state,
)
from taichi_nerfs_tpu.train.swr_step import SwrTrainConfig, create_swr_state

mcfg = PyramidConfig(resolutions=(8, 16), features=4, rgb_width=16)
tcfg = SwrTrainConfig(crop=16, max_steps=10, n_chunks=4, tv_w=1e-3)
mesh = make_mesh(8)
state = shard_swr_state(
    create_swr_state(jax.random.PRNGKey(0), mcfg, tcfg), mesh
)
rng = np.random.RandomState(0)
D, H, W = 8, 24, 24
images = jnp.asarray(rng.uniform(0, 1, (D, H, W, 3)), jnp.float32)
pose = np.eye(3, 4, dtype=np.float32)
pose[:, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
pose[2, 3] = 1.5
poses = jnp.asarray(np.stack([pose] * D))
K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
Ks = jnp.asarray(np.stack([K] * D))
crops = jnp.asarray(rng.randint(0, 8, (D, 2)), jnp.int32)
step = make_swr_sharded_step(mcfg, tcfg, mesh, axis=2, flip=True)
batch = shard_swr_batch(mesh, images, poses, Ks, crops)
state, metrics = step(state, *batch)
assert np.isfinite(float(metrics["loss"])), metrics
p = state.params["levels"][0]
shards = [np.asarray(s.data) for s in p.addressable_shards]
for s in shards[1:]:
    np.testing.assert_array_equal(shards[0], s)
print("swr-sharded-ok")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "swr-sharded-ok" in res.stdout


@pytest.mark.slow
def test_swr_sharded_step_inside():
    """Inside-camera crop-parallel step: one cubemap face per program,
    camera carving mask replicated, per-crop slope bounds sharded."""
    code = """
import jax, numpy as np
import jax.numpy as jnp
from taichi_nerfs_tpu.data.synthetic import look_at
from taichi_nerfs_tpu.models.pyramid import PyramidConfig
from taichi_nerfs_tpu.parallel import (
    make_mesh, make_swr_sharded_step, shard_swr_batch, shard_swr_state,
)
from taichi_nerfs_tpu.render.swr import face_slope_bounds
from taichi_nerfs_tpu.train.swr_step import (
    SwrTrainConfig, camera_keep_mask, create_swr_state,
)

mcfg = PyramidConfig(resolutions=(8, 16), features=4, rgb_width=16)
tcfg = SwrTrainConfig(crop=16, max_steps=10, n_chunks=4, random_bg=True,
                      cam_carve=0.1)
mesh = make_mesh(8)
state = shard_swr_state(
    create_swr_state(jax.random.PRNGKey(0), mcfg, tcfg), mesh
)
rng = np.random.RandomState(0)
D, H, W = 8, 24, 24
K = np.array([[16.0, 0, W / 2], [0, 16.0, H / 2], [0, 0, 1]], np.float32)
# all cameras inside, all looking along +x: one face (axis=0, flip=False)
poses, bounds = [], []
for i in range(D):
    eye = np.array([0.05, 0.02 * i - 0.07, 0.03])
    pose = look_at(eye, eye + np.array([1.0, 0.0, 0.0]),
                   np.array([0.0, 0.0, 1.0])).astype(np.float32)
    poses.append(pose)
    b = face_slope_bounds(pose, K, (tcfg.crop, tcfg.crop), 0, 1.0,
                          crop_xy=(4, 4))
    assert b is not None
    bounds.append(b)
images = jnp.asarray(rng.uniform(0, 1, (D, H, W, 3)), jnp.float32)
crops = jnp.asarray(np.full((D, 2), 4), jnp.int32)
keep = jnp.asarray(camera_keep_mask(np.stack(poses), mcfg.grid_res,
                                    tcfg.cam_carve, mcfg.scale))
step = make_swr_sharded_step(
    mcfg, tcfg, mesh, axis=0, flip=False, inside=True,
    with_sigma_keep=True, with_slope_bounds=True,
)
batch = shard_swr_batch(
    mesh, images, jnp.asarray(np.stack(poses)),
    jnp.asarray(np.stack([K] * D)), crops,
)
sb = shard_swr_batch(mesh, jnp.asarray(np.stack(bounds)))[0]
state, metrics = step(state, *batch, keep, sb)
assert np.isfinite(float(metrics["loss"])), metrics
p = state.params["levels"][0]
shards = [np.asarray(s.data) for s in p.addressable_shards]
for s in shards[1:]:
    np.testing.assert_array_equal(shards[0], s)
print("swr-sharded-inside-ok")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "swr-sharded-inside-ok" in res.stdout
