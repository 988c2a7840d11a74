"""TPU smoke subset (VERDICT r1 weak-item 7).

The main suite pins every kernel against CPU oracles with the platform
forced to ``cpu`` (tests/conftest.py — a wedged tunnel must never hang
unit tests).  These tests are the complement: a minimal end-to-end pass
on the REAL attached chip, exercising the two training paths and the
Pallas sweep exactly as ``train.py`` runs them.

Run explicitly with::

    python -m pytest tests/test_tpu_smoke.py -m tpu -q

Each test shells out with the session's original JAX platform (the
``axon``-tunneled TPU) and is skipped when no TPU is reachable.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_TIMEOUT = 900


def _run_tpu(code: str):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the axon plugin claim default
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=_TIMEOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )


def _require_tpu():
    res = _run_tpu(
        "import jax; d = jax.devices(); "
        "print(d[0].platform if d else 'none')"
    )
    out = (res.stdout or "").strip().lower()
    if res.returncode != 0 or out in ("", "none", "cpu"):
        pytest.skip(f"no TPU attached (probe: {out or res.stderr[-200:]})")


def test_tpu_parity_path_train_step():
    """Hash-NGP (parity path): grid warmup + 3 train steps + a test
    render window on the chip, loss finite and decreasing-or-flat."""
    _require_tpu()
    code = """
import numpy as np, jax, jax.numpy as jnp
from taichi_nerfs_tpu.config import Config, ModelConfig, HashGridConfig, RenderConfig, TrainConfig
from taichi_nerfs_tpu.train.state import create_train_state
from taichi_nerfs_tpu.train.step import Batch, density_grid_step, train_step

cfg = Config(
    model=ModelConfig(scale=0.5,
        grid=HashGridConfig(levels=8, feature_per_level=2, log2_T=15, base_res=16, max_res=256),
        grid_size=64),
    render=RenderConfig(train_sample_cap=64),
    train=TrainConfig(batch_size=1024),
)
rng = np.random.RandomState(0)
data = Batch(
    rays=jnp.asarray(rng.uniform(0, 1, (4, 1024, 3)), jnp.float32),
    poses=jnp.asarray(np.stack([np.concatenate([np.eye(3), [[0],[0],[-1.5]]], 1)]*4), jnp.float32),
    directions=jnp.asarray(rng.uniform(-0.3, 0.3, (1024, 3)) + [0,0,1], jnp.float32),
)
state = create_train_state(cfg)
state = density_grid_step(state, cfg, warmup=True)
losses = []
for _ in range(3):
    state, m = train_step(state, data, cfg, 64)
    losses.append(float(m["loss"]))
assert all(np.isfinite(l) for l in losses), losses
print("parity-smoke-ok", losses)
"""
    res = _run_tpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "parity-smoke-ok" in res.stdout


def test_tpu_flagship_swr_step_pallas():
    """Dense-pyramid flagship: 3 SWR train steps on the chip with the
    Pallas chunk-sweep dispatch (sweep_impl=auto picks it on TPU), and
    the XLA path as a cross-check — losses must be finite and the two
    impls must agree at step 0."""
    _require_tpu()
    code = """
import numpy as np, jax
from taichi_nerfs_tpu.models.pyramid import PyramidConfig
from taichi_nerfs_tpu.train.swr_step import SwrTrainConfig, SwrTrainer
rng = np.random.RandomState(0)
from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
scene = SyntheticSphereDataset(n_images=2, img_wh=(64, 64), variant="checker", n_steps=32)
mcfg = PyramidConfig(resolutions=(16, 32), features=4, deferred=True)
losses = {}
for impl in ("pallas", "xla"):
    tcfg = SwrTrainConfig(crop=64, lr=1e-2, max_steps=10, n_chunks=4, sweep_impl=impl)
    tr = SwrTrainer(mcfg, tcfg, scene.rays, scene.poses, scene.K, scene.img_wh)
    ls = []
    for _ in range(3):
        m = tr.run_step()
        ls.append(float(m["loss"]))
    losses[impl] = ls
    assert all(np.isfinite(l) for l in ls), (impl, ls)
np.testing.assert_allclose(losses["pallas"][0], losses["xla"][0], rtol=2e-2)
print("flagship-smoke-ok", losses)
"""
    res = _run_tpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "flagship-smoke-ok" in res.stdout


def test_tpu_grazing_pose_finite():
    """Regression for the round-3 open bug: one eval view rendered NaN
    on TPU (finite on CPU).  Root cause: the final warp divides by the
    pixel direction's sweep-axis component, computed by a default-
    precision (bf16-pass) TPU matmul — grazing pixels rounded to exactly
    0 and inf*0 leaked NaN into the lattice coords (render/swr.py
    t_hit).  Renders the grazing pose class from tests/test_swr.py on
    the REAL chip at eval-like resolution and asserts finiteness."""
    _require_tpu()
    code = """
import numpy as np, jax, jax.numpy as jnp
from taichi_nerfs_tpu.data.synthetic import look_at
from taichi_nerfs_tpu.models import pyramid as pyr
from taichi_nerfs_tpu.render.swr import render_swr

cfg = pyr.PyramidConfig(resolutions=(16, 32), features=4, rgb_width=16,
                        scale=0.5, sigma_bias=0.0)
params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
R = cfg.grid_res
c = (jnp.arange(R) + 0.5) / R - 0.5
xx, yy, zz = jnp.meshgrid(c, c, c, indexing="ij")
r = jnp.sqrt(xx**2 + yy**2 + zz**2)
# near-ceiling density (the failing view carried a sigma ~ e^9 floater)
params["levels"][1] = params["levels"][1].at[..., 0].add(
    8000.0 * jnp.exp(-((r / 0.25) ** 2)))
grid = pyr.bake(params, cfg)

w = h = 400
eye = 1.3 * np.array([0.0, 0.7072, 0.7070])
pose = look_at(eye, np.zeros(3), np.array([1.0, 0.0, 0.0])).astype(np.float64)
focal = 0.45 * w
K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32)
out = render_swr(params, grid, cfg, pose, K, (w, h), n_chunks=8)
for k in ("rgb", "depth", "opacity"):
    a = np.asarray(out[k])
    assert np.all(np.isfinite(a)), (k, int(np.sum(~np.isfinite(a))))
assert float(np.max(np.asarray(out["opacity"]))) > 0.3
print("grazing-smoke-ok")
"""
    res = _run_tpu(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "grazing-smoke-ok" in res.stdout


@pytest.mark.slow
def test_tpu_quality_floor():
    """Marked tpu+slow quality-floor regression (round-3 verdict item 1:
    records must be pinned by a test, after the unreproducible-28.1
    episode).  Runs the shipped quality protocol (scripts/quality_run.py
    — the same code path as the records in docs/) at a reduced scale on
    the real chip and pins a floor: every held-out view finite, eval
    PSNR above a level the round-4 code comfortably clears.  A silent
    quality regression in the trainer, bake chain, eval sweep, or GT
    generator trips this before it can contaminate a record."""
    _require_tpu()
    import tempfile

    state = os.path.join(tempfile.mkdtemp(prefix="qfloor_"), "s.pkl")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "quality_run.py"),
         "--total_steps", "1200", "--wall", "900", "--state", state,
         "--pyramid_levels", "32,64,128", "--features", "8",
         "--level_features", "8,8,8", "--bake_dtype", "float32",
         "--lr", "1e-2", "--alpha_w", "0.1", "--random_bg",
         "--views", "40", "--res", "400", "--eval_views", "10"],
        env=env, capture_output=True, text=True, timeout=1800, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    import re

    m = re.search(
        r"RECORD: eval_psnr=([\d.]+) .*views=(\d+)", res.stdout
    )
    assert m, res.stdout[-2000:]
    psnr, views = float(m.group(1)), int(m.group(2))
    assert views == 10, res.stdout[-1000:]
    # floor, not record: R=128 / 1200 steps on the 400^2 proxy clears
    # ~24 dB with margin; a regression to the low 20s means something
    # structural broke
    assert psnr >= 22.0, f"quality floor tripped: {psnr}"
