"""Model family registry (rebuild of MODEL_DICT, networks.py:578-581).

Each family exposes the uniform functional interface
``init_params(key, cfg) / forward(params, cfg, x, d) / density(params, cfg,
x)`` consumed by the renderer and the occupancy-grid updater.
"""

from __future__ import annotations

from types import SimpleNamespace

from . import ngp, voxel_grid

MODEL_DICT = {
    "ngp": SimpleNamespace(
        init_params=ngp.init_ngp_params,
        forward=ngp.forward,
        density=ngp.density,
    ),
    "svox": SimpleNamespace(
        init_params=voxel_grid.init_params,
        forward=voxel_grid.forward,
        density=voxel_grid.density,
    ),
}


def get_model(name: str):
    return MODEL_DICT[name]
