"""Materialize in-memory datasets to the blender / instant-ngp layouts.

Counterpart of ``nsvf_export.py`` for the other two transforms-style
loaders (rebuilds of ``/root/reference/datasets/{nerf,ngp}.py``), so the
real disk loaders are exercised end-to-end on procedural scenes (this
container cannot download the benchmark datasets):

* blender: ``transforms_{split}.json`` + ``r_%d.png`` per frame, read
  back by ``NeRFDataset`` (fov-only intrinsics at the 800^2 base
  resolution, pose axis flip, radius renormalized to 1.5 —
  reference nerf.py:56-60);
* instant-ngp: one ``transforms.json`` with ``fl_x/fl_y/w/h`` + image
  files, read back by ``NGPDataset`` (axis flip only, poses preserved —
  reference ngp.py:22-59).
"""

from __future__ import annotations

import json
import math
import os

import imageio.v2 as imageio
import numpy as np


def _write_images(root: str, ds, names) -> None:
    w, h = ds.img_wh
    imgs = np.asarray(ds.rays, np.float32).reshape(-1, h, w, 3)
    for img, name in zip(imgs, names):
        imageio.imwrite(
            os.path.join(root, name),
            np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8),
        )


def _flip_pose(pose: np.ndarray) -> np.ndarray:
    """[right down front] -> [right up back] (the loaders' inverse)."""
    c2w = np.concatenate(
        [np.asarray(pose, np.float64), [[0, 0, 0, 1]]], axis=0
    )
    c2w[:3, 1:3] *= -1
    return c2w


def export_blender_dataset(root: str, datasets: dict) -> None:
    """Write ``datasets`` (split -> BaseDataset-like) as a blender scene.

    ``NeRFDataset`` renormalizes every camera to radius 1.5
    (nerf.py:56-60), so sources must sit at radius 1.5 for an exact pose
    round-trip; the focal is stored 800-based so loading with
    ``downsample = w/800`` round-trips K.
    """
    os.makedirs(root, exist_ok=True)
    for split, ds in datasets.items():
        w, h = ds.img_wh
        assert w == h, "loader assumes square 800-based images"
        fx800 = float(ds.K[0, 0]) * (800.0 / w)
        frames = []
        names = [f"r_{split}_{i}" for i in range(len(ds.poses))]
        for pose, name in zip(ds.poses, names):
            frames.append(
                {
                    "file_path": f"./{name}",
                    "transform_matrix": _flip_pose(pose).tolist(),
                }
            )
        meta = {
            "camera_angle_x": 2.0 * math.atan(0.5 * 800.0 / fx800),
            "frames": frames,
        }
        with open(
            os.path.join(root, f"transforms_{split}.json"), "w"
        ) as f:
            json.dump(meta, f)
        _write_images(root, ds, [n + ".png" for n in names])


def export_ngp_dataset(root: str, ds) -> None:
    """Write one split as an instant-ngp scene (``transforms.json``).

    ``NGPDataset`` applies only the axis flip (ngp.py:43-44), so poses
    and K round-trip exactly at ``downsample=1``.
    """
    os.makedirs(root, exist_ok=True)
    w, h = ds.img_wh
    names = [f"{i:04d}.png" for i in range(len(ds.poses))]
    frames = [
        {"file_path": name, "transform_matrix": _flip_pose(pose).tolist()}
        for pose, name in zip(ds.poses, names)
    ]
    meta = {
        "w": w,
        "h": h,
        "fl_x": float(ds.K[0, 0]),
        "fl_y": float(ds.K[1, 1]),
        "frames": frames,
    }
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(meta, f)
    _write_images(root, ds, names)
