"""Dataset base class — host-side numpy, device-side Batch.

Rebuild of ``datasets/base.py``: loaders fill ``self.rays`` (N_images, H*W, C)
and ``self.poses`` (N_images, 3, 4) as numpy; ``as_batch()`` ships them to
the accelerator once, and per-step random (image, pixel) sampling happens
*inside* the jitted train step (``train/step.py:sample_batch``) rather than
through a torch ``Dataset.__getitem__``.
"""

from __future__ import annotations

import numpy as np

from ..ops.rays import get_ray_directions_np


class BaseDataset:
    def __init__(self, root_dir: str, split: str = "train", downsample: float = 1.0):
        self.root_dir = root_dir
        self.split = split
        self.downsample = downsample
        self.rays: np.ndarray = np.zeros((0, 0, 3), np.float32)
        self.poses: np.ndarray = np.zeros((0, 3, 4), np.float32)
        self.K: np.ndarray = np.eye(3, dtype=np.float32)
        self.img_wh = (0, 0)
        self.directions: np.ndarray = np.zeros((0, 3), np.float32)

    def _set_directions(self):
        w, h = self.img_wh
        self.directions = get_ray_directions_np(h, w, self.K)

    def __len__(self) -> int:
        return len(self.poses)

    def as_batch(self):
        """Device-resident training arrays (lazy import avoids cycles)."""
        import jax.numpy as jnp

        from ..train.step import Batch

        return Batch(
            rays=jnp.asarray(self.rays[..., :3], jnp.float32),
            poses=jnp.asarray(self.poses, jnp.float32),
            directions=jnp.asarray(self.directions, jnp.float32),
        )

    def __getitem__(self, idx: int):
        """Full-image item for eval loops (reference: base.py:62-69)."""
        sample = {"pose": self.poses[idx], "img_idxs": idx}
        if len(self.rays) > 0:
            sample["rgb"] = self.rays[idx][:, :3]
        return sample
