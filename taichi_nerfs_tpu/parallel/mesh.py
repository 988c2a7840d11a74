"""Device mesh construction and sharding helpers.

The reference is strictly single-GPU (SURVEY §2.4 — no torch.distributed, no
NCCL); multi-chip scaling here is a new capability: ray-batch data
parallelism over an ICI mesh, with replicated field parameters and psum'd
gradients/metrics.  The same code runs on a virtual
``--xla_force_host_platform_device_count`` CPU mesh for testing.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: int | None = None, axis_names: Sequence[str] = (DATA_AXIS,)
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
