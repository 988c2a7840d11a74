"""Image reading / color-space helpers (rebuild of datasets/color_utils.py)."""

from __future__ import annotations

import cv2
import imageio.v2 as imageio
import numpy as np


def srgb_to_linear(img: np.ndarray) -> np.ndarray:
    # reference: datasets/color_utils.py:7-11
    limit = 0.04045
    return np.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img: np.ndarray) -> np.ndarray:
    # reference: datasets/color_utils.py:13-16
    limit = 0.0031308
    return np.where(img > limit, 1.055 * img ** (1 / 2.4) - 0.055, 12.92 * img)


def read_image(img_path: str, img_wh, blend_a: bool = True) -> np.ndarray:
    """Load an image, alpha-blend to white, resize, flatten to (h*w, 3).

    Reference: ``datasets/color_utils.py:19-31``.
    """
    img = imageio.imread(img_path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    # img[..., :3] = srgb_to_linear(img[..., :3])  # reference keeps srgb too
    if img.shape[2] == 4:  # alpha channel
        if blend_a:
            img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
        else:
            img = img[..., :3] * img[..., -1:]
    img = cv2.resize(img, tuple(img_wh))
    return img.reshape(-1, 3)
