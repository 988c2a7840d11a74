"""Dense multi-resolution feature pyramid — the shear-warp renderer's field.

The gather-free counterpart of the hash/brick encoders (docs/shear_warp.md):
parameters are dense level grids summed ("baked") each step into one fused
grid whose channel 0 is the density logit and whose remaining channels feed
an NGP-style rgb MLP (SH-16 direction encoding, sigmoid output — same heads
as ``models/ngp.py``, reference networks.py:111-132).

The pyramid parameterization keeps the multi-resolution optimization bias
of the reference's hash grid; baking (trilinear upsample + add, pure
streaming) makes rendering touch a single dense grid.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.sh import sh_encode
from .mlp import MLPSpec, apply_mlp, init_mlp
from .ngp import trunc_exp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    resolutions: Tuple[int, ...] = (32, 64, 128, 256)
    features: int = 8  # channel 0 = density logit
    rgb_width: int = 64
    rgb_depth: int = 2
    scale: float = 0.5
    # density-logit init bias: start mostly transparent (sigma ~ e^bias)
    sigma_bias: float = -2.0

    @property
    def grid_res(self) -> int:
        return self.resolutions[-1]


def rgb_mlp_spec(cfg: PyramidConfig) -> MLPSpec:
    return MLPSpec(
        input_dim=16 + (cfg.features - 1),
        output_dim=3,
        net_depth=cfg.rgb_depth,
        net_width=cfg.rgb_width,
        bias_enabled=False,
        output_activation="sigmoid",
    )


def init_pyramid_params(key: jax.Array, cfg: PyramidConfig) -> Params:
    keys = jax.random.split(key, len(cfg.resolutions) + 1)
    levels = []
    for k, r in zip(keys[:-1], cfg.resolutions):
        levels.append(
            1e-2
            * jax.random.normal(k, (r, r, r, cfg.features), jnp.float32)
        )
    return {
        "levels": levels,
        "rgb_mlp": init_mlp(keys[-1], rgb_mlp_spec(cfg)),
    }


def bake(params: Params, cfg: PyramidConfig) -> jnp.ndarray:
    """Fuse the pyramid into one (R, R, R, F) grid (dense streaming).

    Channel 0 is exponentiated (TruncExp) at bake time so the baked grid
    carries *sigma*, not its logit: the renderer's resamples zero-pad
    outside the scene, and zero sigma is transparency while a zero logit
    would be unit density (fog).
    """
    R = cfg.grid_res
    out = None
    for g in params["levels"]:
        if g.shape[0] != R:
            g = jax.image.resize(
                g, (R, R, R, cfg.features), method="trilinear"
            )
        out = g if out is None else out + g
    sigma = trunc_exp(out[..., 0] + cfg.sigma_bias)
    return jnp.concatenate([sigma[..., None], out[..., 1:]], axis=-1)


def density_from_grid(grid_slab: jnp.ndarray) -> jnp.ndarray:
    """Channel 0 of the baked grid is sigma already; clamp resample
    undershoot."""
    return jnp.maximum(grid_slab[..., 0], 0.0)


def rgb_from_features(
    params: Params,
    cfg: PyramidConfig,
    feats: jnp.ndarray,
    dirs: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(..., F-1) features + (..., 3) unit dirs -> (..., 3) rgb."""
    d_enc = sh_encode((dirs + 1.0) / 2.0)
    rgb_in = jnp.concatenate([d_enc, feats], axis=-1)
    return apply_mlp(
        params["rgb_mlp"], rgb_mlp_spec(cfg), rgb_in, compute_dtype
    ).astype(jnp.float32)
