"""taichi_nerfs_tpu — a TPU-native (JAX/XLA/Pallas) Instant-NGP framework.

Brand-new rebuild of the capabilities of taichi-dev/taichi-nerfs (PyTorch +
Taichi CUDA kernels) as a single fused XLA program per train/render step:
multiresolution hash encoding, occupancy-grid ray marching, volume-render
compositing, SH direction encoding, distortion loss, dataset loaders, train
driver, interactive viewer, deployment export, and ray-parallel multi-chip
scaling via jax.sharding.
"""

from .config import (
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
