"""Serialized compiled-artifact (jax.export) round trip — the counterpart
of the reference's checked-in AOT ABI (deployment/InstantNGP/taichi_ngp/
compiled/: .spv kernels + metadata.json consumed cold by the C++ runner).
"""

import json
import os

import jax
import numpy as np
import pytest

from taichi_nerfs_tpu.models import pyramid as pyr
from taichi_nerfs_tpu.models.pyramid import PyramidConfig
from taichi_nerfs_tpu.utils.aot import (
    export_compiled,
    export_pyramid_compiled,
    load_compiled,
    load_pyramid_renderer,
)


def test_export_compiled_roundtrip(tmp_path):
    import jax.numpy as jnp

    def f(x, y):
        return {"z": jnp.tanh(x) @ y}

    x = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    y = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    export_compiled(f, [x, y], str(tmp_path), name="toy")
    meta = json.load(open(tmp_path / "metadata.json"))
    assert meta["toy"]["in_avals"][0]["shape"] == [8, 4]
    assert meta["toy"]["out_avals"][0]["shape"] == [8, 3]
    assert os.path.getsize(tmp_path / "toy.stablehlo.bin") > 0
    g = load_compiled(str(tmp_path), "toy")
    np.testing.assert_allclose(
        np.asarray(g(x, y)["z"]), np.tanh(x) @ y, rtol=1e-5, atol=1e-5
    )


def test_pyramid_aot_artifact(tmp_path):
    """Six (axis, flip) entry points; deserialized render matches the
    live jitted render bit-for-bit on the same platform."""
    from taichi_nerfs_tpu.render.swr import render_swr

    cfg = PyramidConfig(
        resolutions=(8, 16), features=4, rgb_width=16, scale=0.5,
        deferred=True,
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
    # non-trivial content: random logits so the render composites
    params["levels"] = [
        g + 0.5 * jax.random.normal(jax.random.PRNGKey(i + 1), g.shape)
        for i, g in enumerate(params["levels"])
    ]
    K = np.array(
        [[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]], np.float32
    )
    out_dir = str(tmp_path / "compiled")
    # lat_cap = full lattice so the live render_swr call below (uncapped)
    # compiles the identical program
    export_pyramid_compiled(params, cfg, K, (32, 32), out_dir, lat_cap=48)

    meta = json.load(open(os.path.join(out_dir, "metadata.json")))
    names = [f"pyramid_render_a{a}f{f}" for a in range(3) for f in (0, 1)]
    assert all(n in meta for n in names)
    for n in names:
        assert os.path.exists(os.path.join(out_dir, meta[n]["file"]))

    render = load_pyramid_renderer(out_dir)
    grid = pyr.bake_jit(params, cfg)
    from taichi_nerfs_tpu.data.synthetic import look_at

    for eye in ([0.2, 0.1, 1.2], [1.1, 0.3, -0.2], [-0.2, -1.3, 0.4]):
        pose = look_at(
            np.asarray(eye), np.zeros(3), np.array([0.0, 0.0, 1.0])
        ).astype(np.float32)
        got = render(grid, params["rgb_mlp"], pose)
        want = render_swr(
            params, grid, cfg, pose, K, (32, 32),
            skip_empty=True, warp="gather",
        )
        np.testing.assert_allclose(
            np.asarray(got["rgb"]), np.asarray(want["rgb"]),
            rtol=1e-5, atol=1e-5,
        )
        assert np.isfinite(np.asarray(got["rgb"])).all()


@pytest.mark.tpu
def test_pyramid_aot_artifact_tpu(tmp_path):
    """The artifact also exports lowered-for-TPU (the deployment target):
    platforms recorded in metadata."""
    cfg = PyramidConfig(
        resolutions=(8,), features=4, rgb_width=16, scale=0.5,
        deferred=True,
    )
    params = pyr.init_pyramid_params(jax.random.PRNGKey(0), cfg)
    K = np.array(
        [[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]], np.float32
    )
    out_dir = str(tmp_path / "compiled")
    export_pyramid_compiled(
        params, cfg, K, (32, 32), out_dir, platforms=("tpu", "cpu")
    )
    meta = json.load(open(os.path.join(out_dir, "metadata.json")))
    assert set(meta["pyramid_render_a0f0"]["platforms"]) == {"tpu", "cpu"}
