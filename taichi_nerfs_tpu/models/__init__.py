from . import mlp, ngp, occupancy  # noqa: F401
