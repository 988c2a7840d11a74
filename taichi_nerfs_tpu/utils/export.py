"""Deployment export: npy dict + tagged binary weight format.

Rebuild of the reference's two export stages:

* ``save_deployment_model`` (``modules/utils.py:230-253``) — a
  ``deployment.npy`` dict of poses, density bitfield (uint8 layout), flat
  hash table, per-level scale, and flattened MLP weights in *torch* layout
  (out, in), with the rgb output matrix zero-padded from 13x16... to a
  square 16x16 (``utils.py:231-233``);
* ``save_aot_weights`` (``deployment/InstantNGP/taichi_ngp/taichi_ngp.py:34-64``)
  — per-tensor ``.bin`` files with an ``int32(dtype_tag) int32(count)``
  header followed by the raw little-endian buffer.  Tags: 0=f32, 1=f16,
  2=i32, 3=i16, 4=u32, 5=u16.  The native runner in ``native/`` parses this
  format.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..config import ModelConfig
from ..ops.hash_encoder import build_layout
from ..ops.math import bitfield_to_u8

DTYPE_TAGS = {
    np.dtype(np.float32): 0,
    np.dtype(np.float16): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int16): 3,
    np.dtype(np.uint32): 4,
    np.dtype(np.uint16): 5,
}


def _torch_layout(w: np.ndarray) -> np.ndarray:
    """Our linear weights are (in, out); the reference exports torch's
    (out, in)."""
    return np.ascontiguousarray(w.T)


def deployment_dict(
    params, cfg: ModelConfig, occupancy_bitfield, poses
) -> Dict[str, np.ndarray]:
    """Assemble the ``deployment.npy`` payload (utils.py:230-253)."""
    layout = build_layout(cfg.grid)
    xyz_w = [
        _torch_layout(np.asarray(params["xyz_mlp"][f"w{i}"], np.float32))
        for i in range(cfg.xyz_net_depth + 1)
    ]
    rgb_w = [
        _torch_layout(np.asarray(params["rgb_mlp"][f"w{i}"], np.float32))
        for i in range(cfg.rgb_net_depth + 1)
    ]
    # square-pad the rgb output matrix (3, W) -> (W, W) with zero rows
    out = rgb_w[-1]
    pad = np.zeros((out.shape[1] - out.shape[0], out.shape[1]), np.float32)
    rgb_w[-1] = np.concatenate([out, pad], axis=0)

    return {
        "poses": np.asarray(poses, np.float32),
        "model.density_bitfield": np.asarray(
            bitfield_to_u8(occupancy_bitfield)
        ),
        # our table is (F, n_entries); the reference interleaves features
        # per entry (hash_encoder.py:134-136) -> transpose before flattening
        "model.hash_encoder.params": np.ascontiguousarray(
            np.asarray(params["hash_table"], np.float32).T
        ).reshape(-1),
        "model.per_level_scale": np.float32(layout.log_b),
        "model.xyz_encoder.params": np.concatenate(
            [w.reshape(-1) for w in xyz_w]
        ),
        "model.rgb_net.params": np.concatenate(
            [w.reshape(-1) for w in rgb_w]
        ),
    }


def save_deployment_model(params, cfg: ModelConfig, occupancy_bitfield,
                          poses, save_dir: str) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "deployment.npy")
    np.save(path, deployment_dict(params, cfg, occupancy_bitfield, poses))
    return path


def save_tagged_binary(path: str, arr: np.ndarray):
    """Write one tensor in the tagged .bin format (taichi_ngp.py:34-64)."""
    arr = np.ascontiguousarray(arr)
    tag = DTYPE_TAGS.get(arr.dtype)
    if tag is None:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    header = np.array([tag, arr.size], np.int32)
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(arr.reshape(-1).tobytes())


def load_tagged_binary(path: str) -> np.ndarray:
    """Parse the tagged .bin format (inverse of :func:`save_tagged_binary`)."""
    inv = {v: k for k, v in DTYPE_TAGS.items()}
    with open(path, "rb") as f:
        tag, count = np.frombuffer(f.read(8), np.int32)
        data = np.frombuffer(f.read(), inv[int(tag)])
    assert data.size == count, f"{path}: {data.size} != {count}"
    return data


def export_native(
    params,
    cfg: ModelConfig,
    occupancy_bitfield,
    poses,
    K,
    img_wh,
    out_dir: str,
    render_cfg=None,
    pose_index: int = 20,
) -> str:
    """Full native-runner export: tagged .bin weights + config.json.

    The counterpart of ``taichi_ngp.py --aot`` (taichi_ngp.py:181-189):
    everything the C++ runner in ``native/`` needs to render — the reference
    hardcodes these constants in three places (kernels.py:33-66,
    app_fp32.hpp:55-69); we serialize them once.
    """
    import json

    dep = deployment_dict(params, cfg, occupancy_bitfield, poses)
    export_aot_weights(dep, out_dir, pose_index=pose_index)
    layout = build_layout(cfg.grid)
    w, h = img_wh
    K = np.asarray(K, np.float32)
    config = {
        "width": int(w),
        "height": int(h),
        "fx": float(K[0, 0]),
        "fy": float(K[1, 1]),
        "cx": float(K[0, 2]),
        "cy": float(K[1, 2]),
        "scale": float(cfg.scale),
        "grid_size": int(cfg.grid_size),
        "cascades": int(cfg.cascades),
        "levels": int(cfg.grid.levels),
        "feat_per_level": int(cfg.grid.feature_per_level),
        "log2_T": int(cfg.grid.log2_T),
        "base_res": float(cfg.grid.base_res),
        "log_b": float(layout.log_b),
        "xyz_width": int(cfg.xyz_net_width),
        "xyz_out": int(cfg.xyz_net_out_dim),
        "rgb_width": int(cfg.rgb_net_width),
        # hidden depth of the rgb chain: 2 in the default model, 1 in
        # the mobile deployment config (train.py:88-100)
        "rgb_depth": int(cfg.rgb_net_depth),
        "exp_step_factor": float(
            getattr(render_cfg, "exp_step_factor", 0.0)
        ),
        # mobile threshold 1e-2 (app_fp32.hpp:68)
        "t_threshold": float(getattr(render_cfg, "t_threshold", 1e-2)),
        "max_samples": int(getattr(render_cfg, "max_samples", 1024)),
        "white_bg": bool(getattr(render_cfg, "white_bg", True)),
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return out_dir


def export_aot_weights(
    deployment: Dict[str, np.ndarray],
    out_dir: str,
    pose_index: int = 20,
    directions: np.ndarray | None = None,
):
    """Write the per-tensor .bin weight set the native runner consumes
    (taichi_ngp.py:66-88)."""
    os.makedirs(out_dir, exist_ok=True)
    save_tagged_binary(
        os.path.join(out_dir, "hash_embedding.bin"),
        deployment["model.hash_encoder.params"].astype(np.float32),
    )
    save_tagged_binary(
        os.path.join(out_dir, "sigma_weights.bin"),
        deployment["model.xyz_encoder.params"].astype(np.float32),
    )
    save_tagged_binary(
        os.path.join(out_dir, "rgb_weights.bin"),
        deployment["model.rgb_net.params"].astype(np.float32),
    )
    save_tagged_binary(
        os.path.join(out_dir, "density_bitfield.bin"),
        deployment["model.density_bitfield"].view(np.uint32),
    )
    poses = deployment["poses"]
    pose_index = min(pose_index, len(poses) - 1)
    save_tagged_binary(
        os.path.join(out_dir, "pose.bin"),
        poses[pose_index].astype(np.float32).reshape(3, 4),
    )
    if directions is not None:
        save_tagged_binary(
            os.path.join(out_dir, "directions.bin"),
            directions.astype(np.float32),
        )


def export_pyramid_native(
    params,
    pyramid_cfg,
    pose,
    K,
    img_wh,
    out_dir: str,
    white_bg: bool = True,
    t_threshold: float = 1e-2,
    grid_dtype=np.float16,
) -> str:
    """Native export of the dense-pyramid flagship: the *baked* grid (the
    renderer's whole field — fp16 by default, half the file) + the rgb MLP
    + camera, consumed by ``native/src/pyramid_model.cpp``.

    The sample-path export ships the hash table and re-runs encoders on
    device (taichi_ngp.py style); the dense path's deployment artifact is
    simply the fused grid — trilinear sampling is the entire field eval.
    """
    import json

    from ..models import pyramid as pyr

    if pyramid_cfg.split:
        raise NotImplementedError(
            "native export of split-resolution grids: bake to a single "
            "grid (sigma_res=0) for deployment"
        )
    if not pyramid_cfg.deferred:
        raise NotImplementedError(
            "the native pyramid renderer shades deferred; train with "
            "deferred=True (the default) for deployment"
        )
    os.makedirs(out_dir, exist_ok=True)
    grid = np.asarray(pyr.bake_jit(params, pyramid_cfg))
    save_tagged_binary(
        os.path.join(out_dir, "grid.bin"), grid.astype(grid_dtype)
    )
    for i in range(3):
        w = _torch_layout(
            np.asarray(params["rgb_mlp"][f"w{i}"], np.float32)
        )
        save_tagged_binary(os.path.join(out_dir, f"rgb_w{i}.bin"), w)
    save_tagged_binary(
        os.path.join(out_dir, "pose.bin"),
        np.asarray(pose, np.float32).reshape(3, 4),
    )
    K = np.asarray(K, np.float32)
    w_img, h_img = img_wh
    config = {
        "model": "pyramid",
        "width": int(w_img),
        "height": int(h_img),
        "fx": float(K[0, 0]),
        "fy": float(K[1, 1]),
        "cx": float(K[0, 2]),
        "cy": float(K[1, 2]),
        "scale": float(pyramid_cfg.scale),
        "grid_res": int(pyramid_cfg.grid_res),
        "features": int(pyramid_cfg.features),
        "rgb_width": int(pyramid_cfg.rgb_width),
        "deferred": True,
        "white_bg": bool(white_bg),
        "t_threshold": float(t_threshold),
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return out_dir
