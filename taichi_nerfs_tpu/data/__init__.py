"""Dataset registry (rebuild of datasets/__init__.py:6-11)."""

from .base import BaseDataset  # noqa: F401
from .colmap import ColmapDataset
from .nerf import NeRFDataset
from .ngp import NGPDataset
from .nsvf import NSVFDataset
from .synthetic import SyntheticSphereDataset

dataset_dict = {
    "nerf": NeRFDataset,
    "nsvf": NSVFDataset,
    "colmap": ColmapDataset,
    "ngp": NGPDataset,
    "synthetic": SyntheticSphereDataset,
}
