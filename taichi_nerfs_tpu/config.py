"""Typed configuration for the TPU-native Instant-NGP framework.

Replaces the reference's argparse flags (``opt.py:4-134``) plus the constants
scattered across call sites (``train.py:54-58,135-141,180``,
``modules/rendering.py:8-9``, ``modules/utils.py:9-16``) with one frozen,
hashable config object that can be passed as a static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

SQRT3 = math.sqrt(3.0)
MAX_SAMPLES = 1024  # reference: modules/utils.py:12, modules/rendering.py:8
NEAR_DISTANCE = 0.01  # reference: modules/utils.py:13


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Multiresolution hash grid (reference: modules/hash_encoder.py:147-235)."""

    levels: int = 16
    feature_per_level: int = 2
    log2_T: int = 19
    base_res: int = 16
    max_res: int = 1024
    # "bfloat16" computes the gather/interp in bf16 with fp32 master params
    # (the reference's half2 variant, hash_encoder_half.py:7-9)
    table_dtype: str = "float32"

    @property
    def log_b(self) -> float:
        # reference: modules/utils.py:31-39 (scale_in_level_np)
        return math.log(float(self.max_res) / float(self.base_res)) / float(
            self.levels - 1
        )

    @property
    def out_dim(self) -> int:
        return self.levels * self.feature_per_level


@dataclasses.dataclass(frozen=True)
class BrickGridConfig:
    """TPU-native brick-grid encoder (see ops/brick_encoder.py).

    Same capability as HashGridConfig, laid out so one row-gather fetches a
    full 2x2x2xF cell brick (TPU random access is row-rate-bound)."""

    levels: int = 8
    feature_per_level: int = 4
    log2_rows: int = 17  # hashed-level brick rows (8F params each)
    base_res: int = 16
    max_res: int = 1024
    table_dtype: str = "float32"  # "bfloat16" = half2-analogue compute

    @property
    def log_b(self) -> float:
        return math.log(float(self.max_res) / float(self.base_res)) / float(
            max(self.levels - 1, 1)
        )

    @property
    def out_dim(self) -> int:
        return self.levels * self.feature_per_level


@dataclasses.dataclass(frozen=True)
class TriPlaneConfig:
    """Tri-plane encoder (reference: modules/triplane.py:103-157)."""

    levels: int = 8
    feature_per_level: int = 4
    base_res: int = 16
    max_res: int = 1024

    @property
    def log_b(self) -> float:
        return math.log(float(self.max_res) / float(self.base_res)) / float(
            self.levels - 1
        )

    @property
    def out_dim(self) -> int:
        return self.levels * self.feature_per_level


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """NGP model configuration (reference: modules/networks.py:35-52,
    train.py:87-107)."""

    name: str = "ngp"  # model family: {"ngp", "svox"}
    scale: float = 0.5
    pos_encoder_type: str = "hash"  # {"hash", "triplane", "brick"}
    grid: HashGridConfig = HashGridConfig()
    triplane: TriPlaneConfig = TriPlaneConfig()
    brick: BrickGridConfig = BrickGridConfig()
    grid_size: int = 128
    # svox (dense SH voxel grid) family (reference: networks.py:382-434,
    # opt.py:51-74)
    voxel_grid_size: int = 256
    voxel_radius: float = 0.0125
    voxel_sh_degree: int = 2
    voxel_origin_sh: float = 0.0
    voxel_origin_sigma: float = 0.1
    xyz_net_width: int = 64
    xyz_net_depth: int = 1
    xyz_net_out_dim: int = 16
    rgb_net_width: int = 64
    rgb_net_depth: int = 2
    sh_degree: int = 4  # 16-dim direction encoding
    # compute dtype for the MLP matmuls ("bfloat16" rides the MXU; params
    # stay float32).  The reference's analogue is fp16 autocast
    # (train.py:177) with a 2**19 GradScaler; bf16 needs no scaler.
    mlp_dtype: str = "bfloat16"

    @property
    def cascades(self) -> int:
        # reference: modules/networks.py:63
        return max(1 + int(math.ceil(math.log2(2 * self.scale))), 1)

    @property
    def sh_dim(self) -> int:
        return (self.sh_degree) ** 2

    @property
    def pos_out_dim(self) -> int:
        if self.pos_encoder_type == "hash":
            return self.grid.out_dim
        if self.pos_encoder_type == "triplane":
            return self.triplane.out_dim
        if self.pos_encoder_type == "brick":
            return self.brick.out_dim
        raise NotImplementedError(self.pos_encoder_type)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Rendering constants (reference: modules/rendering.py:8-18, train.py:54)."""

    exp_step_factor: float = 0.0  # 1/256 when scale > 0.5 (train.py:54)
    t_threshold: float = 1e-4
    max_samples: int = MAX_SAMPLES
    # static per-ray sample capacity of the dense (N_rays, S) sample grid;
    # the train loop adapts this between power-of-two buckets.
    train_sample_cap: int = MAX_SAMPLES
    # samples marched per round in the test-time renderer
    test_chunk_samples: int = 32
    white_bg: bool = True  # synthetic scenes (rendering.py:219-226)
    random_bg: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (reference: train.py, opt.py)."""

    batch_size: int = 8192
    max_steps: int = 20000
    lr: float = 1e-2
    lr_final_div: float = 30.0  # cosine anneal to lr/30 (train.py:159-163)
    adam_eps: float = 1e-15
    update_interval: int = 16  # density grid update cadence (train.py:58)
    warmup_steps: int = 256  # density grid warmup (train.py:57)
    density_decay: float = 0.95
    distortion_loss_w: float = 0.0
    ray_sampling_strategy: str = "all_images"  # {"all_images", "same_image"}
    seed: int = 23  # reference: train.py:39

    def density_threshold(self, max_samples: int = MAX_SAMPLES) -> float:
        # reference: train.py:180
        return 0.01 * max_samples / SQRT3


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level experiment config."""

    model: ModelConfig = ModelConfig()
    render: RenderConfig = RenderConfig()
    train: TrainConfig = TrainConfig()
    # dataset
    root_dir: str = ""
    dataset_name: str = "nsvf"
    split: str = "train"
    downsample: float = 1.0
    exp_name: str = "exp"
    ckpt_path: Optional[str] = None
    # parallelism: number of data-parallel shards along the ray axis
    num_devices: int = 1
    mesh_axes: Tuple[str, ...] = ("data",)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_for_scene(
    scale: float, pos_encoder_type: str = "brick", **kw
) -> Config:
    """Mirror the reference's config selection logic (train.py:54,87-107).

    The flagship encoder is the TPU-native brick grid (one row-gather per
    sample-level instead of 8 scalar gathers — ~10x faster on TPU, same
    capability); pass ``pos_encoder_type="hash"`` for the reference's exact
    hash-table layout.
    """
    max_res = 1024 if scale == 0.5 else 4096
    model = ModelConfig(
        scale=scale,
        pos_encoder_type=pos_encoder_type,
        grid=HashGridConfig(max_res=max_res),
        brick=BrickGridConfig(max_res=max_res),
    )
    exp_step_factor = 1 / 256 if scale > 0.5 else 0.0
    render = RenderConfig(
        exp_step_factor=exp_step_factor,
        white_bg=(exp_step_factor == 0.0),
    )
    return Config(model=model, render=render, **kw)


def deployment_model_config(scale: float) -> ModelConfig:
    """Reference deployment config (train.py:88-100)."""
    return ModelConfig(
        scale=scale,
        grid=HashGridConfig(
            levels=4, feature_per_level=4, base_res=32, max_res=128, log2_T=21
        ),
        xyz_net_width=16,
        rgb_net_width=16,
        rgb_net_depth=1,
    )
