"""Instant-NGP radiance field — TPU-native, purely functional.

Rebuild of the reference's ``NGP(nn.Module)`` (``modules/networks.py:33-166``)
as a params-pytree + pure apply functions: multiresolution hash (or triplane)
position encoder -> 1-hidden-layer sigma MLP (TruncExp on channel 0) ->
SH-16 direction encoding -> 2-hidden-layer rgb MLP with sigmoid.

The occupancy grid lives in a separate :mod:`.occupancy` state pytree (the
reference keeps it as module buffers); scene geometry constants come from
:class:`..config.ModelConfig`.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.brick_encoder import (
    brick_encode,
    build_brick_layout,
    init_brick_params,
)
from ..ops.hash_encoder import build_layout, hash_encode, init_hash_table
from ..ops.sh import sh_encode
from ..ops.triplane import init_triplane_table, triplane_encode
from .mlp import MLPSpec, apply_mlp, init_mlp

Params = Dict[str, Any]


@jax.custom_vjp
def trunc_exp(x):
    """exp with clamped backward (reference: networks.py:18-30)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def xyz_mlp_spec(cfg: ModelConfig) -> MLPSpec:
    # reference: networks.py:111-117
    return MLPSpec(
        input_dim=cfg.pos_out_dim,
        output_dim=cfg.xyz_net_out_dim,
        net_depth=cfg.xyz_net_depth,
        net_width=cfg.xyz_net_width,
        bias_enabled=False,
    )


def rgb_mlp_spec(cfg: ModelConfig) -> MLPSpec:
    # reference: networks.py:119-132 (input = SH16 + xyz feature)
    return MLPSpec(
        input_dim=16 + cfg.xyz_net_out_dim,
        output_dim=3,
        net_depth=cfg.rgb_net_depth,
        net_width=cfg.rgb_net_width,
        bias_enabled=False,
        output_activation="sigmoid",
    )


def init_ngp_params(key: jax.Array, cfg: ModelConfig) -> Params:
    k_enc, k_xyz, k_rgb = jax.random.split(key, 3)
    params: Params = {}
    if cfg.pos_encoder_type == "hash":
        params["hash_table"] = init_hash_table(k_enc, build_layout(cfg.grid))
    elif cfg.pos_encoder_type == "triplane":
        params["triplane_table"] = init_triplane_table(k_enc, cfg.triplane)
    elif cfg.pos_encoder_type == "brick":
        params["brick"] = init_brick_params(
            k_enc, build_brick_layout(cfg.brick)
        )
    else:
        raise NotImplementedError(cfg.pos_encoder_type)
    params["xyz_mlp"] = init_mlp(k_xyz, xyz_mlp_spec(cfg))
    params["rgb_mlp"] = init_mlp(k_rgb, rgb_mlp_spec(cfg))
    return params


def _encode_position(params: Params, cfg: ModelConfig, x01: jnp.ndarray):
    if cfg.pos_encoder_type == "hash":
        table = params["hash_table"]
        if cfg.grid.table_dtype == "bfloat16":
            # half2-analogue: bf16 table compute, fp32 master params
            # (reference hash_encoder_half.py:291-299)
            table = table.astype(jnp.bfloat16)
        return hash_encode(table, x01, build_layout(cfg.grid))
    if cfg.pos_encoder_type == "brick":
        # bf16 table compute (half2 analogue) happens inside the encoder's
        # custom VJP, keyed by layout.table_dtype
        return brick_encode(
            params["brick"], x01, build_brick_layout(cfg.brick)
        )
    return triplane_encode(params["triplane_table"], x01, cfg.triplane)


def _compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.mlp_dtype == "bfloat16" else jnp.float32


def density(
    params: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    return_feat: bool = False,
):
    """Density head (reference: networks.py:136-150).

    Args:
        x: (..., 3) positions in [-scale, scale].
    Returns:
        sigmas (...,), optionally also the (..., 16) geometry feature.
    """
    x01 = (x + cfg.scale) / (2.0 * cfg.scale)
    emb = _encode_position(params, cfg, x01)
    h = apply_mlp(
        params["xyz_mlp"], xyz_mlp_spec(cfg), emb, _compute_dtype(cfg)
    )
    sigmas = trunc_exp(h[..., 0].astype(jnp.float32))
    if return_feat:
        return sigmas, h
    return sigmas


def forward(
    params: Params, cfg: ModelConfig, x: jnp.ndarray, d: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full field eval (reference: networks.py:152-166).

    Args:
        x: (..., 3) positions in [-scale, scale].
        d: (..., 3) view directions (not necessarily unit).
    Returns:
        sigmas (...,), rgbs (..., 3).
    """
    sigmas, h = density(params, cfg, x, return_feat=True)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d_enc = sh_encode((d + 1.0) / 2.0)  # instant-ngp remap (networks.py:163)
    rgb_in = jnp.concatenate([d_enc, h], axis=-1)
    rgbs = apply_mlp(
        params["rgb_mlp"], rgb_mlp_spec(cfg), rgb_in, _compute_dtype(cfg)
    ).astype(jnp.float32)
    return sigmas, rgbs
