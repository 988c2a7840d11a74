"""taichi_nerfs_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP framework.

Brand-new rebuild of the capabilities of taichi-dev/taichi-nerfs (PyTorch +
Taichi CUDA kernels) as a single fused XLA program per train/render step:
multiresolution hash encoding, occupancy-grid ray marching, volume-render
compositing, SH direction encoding, distortion loss, dataset loaders, train
driver, interactive viewer, deployment export, and ray-parallel multi-chip
scaling via jax.sharding.
"""

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compilation cache: repeat invocations of the CLI /
    bench / tests skip recompiles (30-120 s each on a tunneled TPU).
    Opt out with TNERF_NO_COMPILE_CACHE=1."""
    if _os.environ.get("TNERF_NO_COMPILE_CACHE"):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("TNERF_COMPILE_CACHE", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_setup_compilation_cache()

from .config import (  # noqa: E402
    Config,
    HashGridConfig,
    ModelConfig,
    RenderConfig,
    TrainConfig,
    config_for_scene,
    deployment_model_config,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "HashGridConfig",
    "ModelConfig",
    "RenderConfig",
    "TrainConfig",
    "config_for_scene",
    "deployment_model_config",
]
