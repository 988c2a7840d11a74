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
    # this image's jax plugin ignores the env var; force via config too.
    # The shard_map programs compile slowly on the emulated 8-device CPU
    # mesh — share the persistent compile cache so repeat runs are warm
    prelude = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from taichi_nerfs_tpu import compile_cache_dir\n"
        "jax.config.update("
        "'jax_compilation_cache_dir', compile_cache_dir())\n"
        "jax.config.update("
        "'jax_persistent_cache_min_compile_time_secs', 0.5)\n"
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


_EQUIV_SETUP = """
import jax, numpy as np
import jax.numpy as jnp
from taichi_nerfs_tpu.parallel import (
    make_mesh, sharded_train_step, sharded_density_grid_step,
    shard_state, shard_batch,
)
from taichi_nerfs_tpu.train.state import create_train_state
from taichi_nerfs_tpu.train.step import Batch, density_grid_step, train_step
from taichi_nerfs_tpu.config import Config, ModelConfig, HashGridConfig, RenderConfig, TrainConfig

# grid_size 16 / 2 hash levels: the sharding mechanics are size-blind
# and the 32^3 scatter programs compile for minutes on the emulated
# 8-device CPU mesh (the full-size path runs in dryrun_multichip)
cfg = Config(
    model=ModelConfig(scale=0.5,
        grid=HashGridConfig(levels=2, feature_per_level=2, log2_T=9, base_res=4, max_res=16),
        grid_size=16, xyz_net_width=16, rgb_net_width=16, mlp_dtype="float32"),
    render=RenderConfig(train_sample_cap=16),
    train=TrainConfig(batch_size=64, distortion_loss_w=1e-3),
)
mesh = make_mesh(8)
rng = np.random.RandomState(0)
data = Batch(
    rays=jnp.asarray(rng.uniform(0, 1, (3, 64, 3)), jnp.float32),
    poses=jnp.asarray(np.stack([np.concatenate([np.eye(3), [[0],[0],[-1.5]]], 1)]*3), jnp.float32),
    directions=jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)) + [0,0,1], jnp.float32),
)
state0 = create_train_state(cfg)

def tree_close(a, b, tol=2e-6):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=tol, atol=tol)
"""


@pytest.mark.slow
def test_sharded_step_equals_single_device():
    """8-way sharded step == single-chip step to fp tolerance: same
    initial state, distortion loss ON — loss, psnr, and every updated
    parameter must agree (the sharded step redraws the single-chip batch
    from the shared rng and slices it, parallel/shard.py)."""
    code = _EQUIV_SETUP + """
s1, m1 = train_step(state0, data, cfg, 16)
s8, m8 = sharded_train_step(
    shard_state(create_train_state(cfg), mesh), shard_batch(data, mesh),
    cfg, mesh, 16)
np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
np.testing.assert_allclose(float(m1["psnr"]), float(m8["psnr"]), rtol=1e-4)
assert int(m1["rm_samples"]) == int(m8["rm_samples"])
assert int(m1["counts_max"]) == int(m8["counts_max"])
tree_close(s1.params, s8.params)
tree_close(s1.opt_state, s8.opt_state)
# replication invariant
p = s8.params["xyz_mlp"]["w0"]
shards = [np.asarray(sh.data) for sh in p.addressable_shards]
for sh in shards[1:]:
    np.testing.assert_array_equal(shards[0], sh)
print("equiv-ok")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "equiv-ok" in res.stdout


@pytest.mark.slow
def test_sharded_density_grid_equals_single_device():
    """Sharded occupancy refresh == single-chip refresh bitwise-ish:
    every chip probes a disjoint 1/8 of the SAME sampled cells, the
    probe grids pmax-reduce, and EMA + packbits replay identically.
    Covers both the warmup (all-cells) and steady-state (sampled-cells)
    programs, after a density-shaping train step."""
    code = _EQUIV_SETUP + """
# warmup refresh
g1 = density_grid_step(state0, cfg, warmup=True)
g8 = sharded_density_grid_step(
    shard_state(create_train_state(cfg), mesh), cfg, mesh, warmup=True)
np.testing.assert_allclose(
    np.asarray(g1.occupancy.density_grid),
    np.asarray(g8.occupancy.density_grid), rtol=2e-6, atol=2e-6)
np.testing.assert_array_equal(
    np.asarray(g1.occupancy.bitfield), np.asarray(g8.occupancy.bitfield))
# steady-state refresh (uniform + occupied-cell categorical sampling)
# from the identical post-warmup states: params agree bitwise, so the
# sharded refresh must too.  (After a train step the single/multi param
# sets differ at float tolerance, which can flip threshold-adjacent
# bitfield bits — that's fp divergence, not a sharding bug.)
r1 = density_grid_step(g1, cfg, warmup=False)
r8 = sharded_density_grid_step(g8, cfg, mesh, warmup=False)
np.testing.assert_allclose(
    np.asarray(r1.occupancy.density_grid),
    np.asarray(r8.occupancy.density_grid), rtol=2e-5, atol=2e-6)
np.testing.assert_array_equal(
    np.asarray(r1.occupancy.bitfield), np.asarray(r8.occupancy.bitfield))
print("grid-equiv-ok")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "grid-equiv-ok" in res.stdout


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


@pytest.mark.slow
def test_sharded_packed_eval_equals_single_device():
    """Per-shard packed field eval (global pack_cap scaled to the shard,
    parallel/shard.py) == single-chip step while no cap truncates —
    the regime the parity guarantee documents."""
    code = _EQUIV_SETUP + """
s1, m1 = train_step(state0, data, cfg, 16, None)
# global pack 512 -> per-shard min(bucket(1.5*512/8), 128) = 96 slots for
# <= 16 rays x 16 samples; the scene leaves plenty of headroom
s8, m8 = sharded_train_step(
    shard_state(create_train_state(cfg), mesh), shard_batch(data, mesh),
    cfg, mesh, 16, 512)
assert int(m1["rm_samples"]) == int(m8["rm_samples"])
np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
tree_close(s1.params, s8.params)
print("pack-equiv-ok")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "pack-equiv-ok" in res.stdout


@pytest.mark.slow
def test_pyramid_cli_num_devices():
    """VERDICT r2 item 3: `train.py --model_name pyramid --num_devices 8`
    must actually train on the mesh (crop-parallel DP), reachable from
    the CLI."""
    code = """
import sys
sys.argv = [
    "train.py", "--root_dir", "synthetic://checker?views=6&res=64",
    "--dataset_name", "synthetic", "--model_name", "pyramid",
    "--num_devices", "8", "--max_steps", "6", "--exp_name", "cli8",
    "--pyramid_levels", "8,16", "--features", "4", "--prog_steps", "",
]
import runpy
runpy.run_path("train.py", run_name="__main__")
"""
    res = _run_cpu(code)
    assert res.returncode == 0, (res.stderr[-3000:], res.stdout[-2000:])
    assert "crop-parallel over a 8-device mesh" in res.stdout
    assert "evaluation:" in res.stdout
