"""Test configuration.

Kernel/model/train tests run on the default platform (the real TPU when one
is attached, CPU otherwise).  Multi-chip sharding tests run in a subprocess
on a virtual 8-device CPU mesh (``--xla_force_host_platform_device_count``)
— see ``test_sharding.py``.
"""

import os

# force, don't setdefault: the interactive shell exports
# JAX_PLATFORMS=axon (the tunneled TPU), and a pytest run that silently
# lands on the tunnel serializes every test through one remote chip —
# and wedges if anything else holds the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The env override above is NOT enough on a machine with the axon
# sitecustomize hook: that hook imports jax at interpreter startup (before
# conftest runs), so jax's platform config latched JAX_PLATFORMS=axon from
# the shell env.  Re-point it at runtime — backends initialize lazily, so
# nothing has touched the tunnel yet and this guarantees the suite never
# does (a down tunnel otherwise hangs/fails CPU-only tests).
jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: repeat pytest runs skip recompiles.
# The dir is keyed by host CPU features (see compile_cache_dir) so a
# container migration can't reload foreign-machine XLA:CPU executables.
from taichi_nerfs_tpu import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from taichi_nerfs_tpu.config import (  # noqa: E402
    Config,
    HashGridConfig,
    ModelConfig,
    RenderConfig,
    TrainConfig,
)


@pytest.fixture(scope="session")
def tiny_config() -> Config:
    """Small config for CPU tests (grid 32^3, 4 hash levels, thin MLPs)."""
    model = ModelConfig(
        scale=0.5,
        grid=HashGridConfig(
            levels=4, feature_per_level=2, log2_T=11, base_res=4, max_res=32
        ),
        grid_size=32,
        xyz_net_width=16,
        rgb_net_width=16,
        mlp_dtype="float32",
    )
    render = RenderConfig(
        exp_step_factor=0.0,
        train_sample_cap=256,
        test_chunk_samples=16,
        white_bg=True,
    )
    train = TrainConfig(
        batch_size=256,
        max_steps=200,
        warmup_steps=40,
        update_interval=8,
    )
    return Config(model=model, render=render, train=train)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    return np.random.RandomState(0)
