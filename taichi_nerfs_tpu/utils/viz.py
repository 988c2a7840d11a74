"""Visualization helpers (rebuild of modules/utils.py:223-228)."""

from __future__ import annotations

import numpy as np


def depth2img(depth: np.ndarray) -> np.ndarray:
    """Normalize a depth map and apply the turbo colormap -> uint8 RGB."""
    import cv2

    depth = np.asarray(depth, np.float32)
    rng = depth.max() - depth.min()
    depth = (depth - depth.min()) / (rng if rng > 0 else 1.0)
    img = cv2.applyColorMap((depth * 255).astype(np.uint8), cv2.COLORMAP_TURBO)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
