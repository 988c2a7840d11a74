"""taichi_nerfs_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP framework.

Brand-new rebuild of the capabilities of taichi-dev/taichi-nerfs (PyTorch +
Taichi CUDA kernels) as a single fused XLA program per train/render step:
multiresolution hash encoding, occupancy-grid ray marching, volume-render
compositing, SH direction encoding, distortion loss, dataset loaders, train
driver, interactive viewer, deployment export, and ray-parallel multi-chip
scaling via jax.sharding.
"""

import os as _os


def compile_cache_dir() -> str:
    """Persistent-cache directory, keyed by the host's CPU feature set.

    XLA:CPU cache entries embed machine features at compile time; if the
    container migrates to a host with a different CPU, reloading a stale
    entry can SIGILL/abort the process.  Keying the directory by a hash of
    the cpuinfo flags turns that into a clean cache miss.  (TPU entries are
    keyed by the platform inside XLA, so sharing a dir per-host is fine.)
    """
    # default under the repo root, NOT /tmp: /tmp is wiped between CI
    # rounds, and a cold cache costs ~190 s of XLA compiles on a 1-core
    # host before the first train step runs (gitignored via .xla_cache/)
    repo_default = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".xla_cache",
    )
    try:
        _os.makedirs(repo_default, exist_ok=True)
    except OSError:  # read-only install prefix: fall back to /tmp
        repo_default = "/tmp/jax_cache"
    base = _os.environ.get("TNERF_COMPILE_CACHE", repo_default)
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f if ln.startswith("flags")), ""
            )
        import hashlib

        tag = hashlib.sha1(flags.encode()).hexdigest()[:8]
        return f"{base}-{tag}"
    except OSError:
        return base


def _setup_compilation_cache():
    """Persistent XLA compilation cache: repeat invocations of the CLI /
    bench / tests skip recompiles (30-120 s each on a tunneled TPU).
    Opt out with TNERF_NO_COMPILE_CACHE=1."""
    if _os.environ.get("TNERF_NO_COMPILE_CACHE"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
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
