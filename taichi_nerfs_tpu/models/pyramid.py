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
    # deferred shading (SNeRG-style): composite *features* along the ray
    # and run the rgb MLP once per pixel on the accumulated feature vector,
    # instead of shading every (slab, lattice) sample.  Cuts the sweep's
    # MLP+SH work by ~n_slabs x; the view-dependent model becomes
    # MLP(sum w*feats, d) rather than sum w*MLP(feats, d)
    deferred: bool = False
    # split resolution: one extra SINGLE-CHANNEL density level at
    # 2 * resolutions[-1].  Geometry (silhouettes, alpha edges) gets the
    # fine grid; appearance stays at the streaming-friendly feature res.
    # A full F-channel level at 512^3 would not fit HBM (4.3 GB params +
    # 2x adam + baked grid); the sigma-only level is 1/8 of that
    sigma_res: int = 0
    # per-level channel widths (default: `features` everywhere).  A LEAN
    # finest level (e.g. (8, 8, 8, 8, 4) for a 512^3 top) adds detail to
    # sigma + the first feature channels at a fraction of the parameter /
    # optimizer-state HBM — the summed-pyramid analogue of NGP's
    # level-concat capacity taper.  Must be non-increasing and start at
    # `features` (the progressive bake adds finer levels into the
    # leading channels of the running sum).
    level_features: Tuple[int, ...] = ()

    def __post_init__(self):
        if self.sigma_res:
            assert self.sigma_res == 2 * self.resolutions[-1], (
                "sigma_res must be 2x the finest feature level "
                f"(got {self.sigma_res} vs {self.resolutions[-1]})"
            )
        if self.level_features:
            lf = self.level_features
            assert len(lf) == len(self.resolutions), (lf, self.resolutions)
            assert lf[0] == self.features, lf
            assert all(
                1 <= b <= a for a, b in zip(lf, lf[1:])
            ), f"level_features must be non-increasing: {lf}"

    def feat_of(self, lv: int) -> int:
        return (
            self.level_features[lv] if self.level_features else self.features
        )

    @property
    def grid_res(self) -> int:
        """Finest *feature* resolution (the slab-sweep granularity)."""
        return self.resolutions[-1]

    @property
    def split(self) -> bool:
        return bool(self.sigma_res)


def truncate(cfg: PyramidConfig, n_levels: int) -> PyramidConfig:
    """Config with only the first ``n_levels`` pyramid levels.

    Used by coarse-to-fine training (``SwrTrainConfig.prog_steps``): early
    phases sweep a low-resolution grid (cheap steps), later phases grow the
    pyramid one level at a time.  Split-resolution configs cannot truncate
    (``sigma_res`` is pinned to the finest level).
    """
    assert 1 <= n_levels <= len(cfg.resolutions)
    assert not cfg.split, "progressive training requires sigma_res=0"
    return dataclasses.replace(
        cfg,
        resolutions=cfg.resolutions[:n_levels],
        level_features=cfg.level_features[:n_levels],
    )


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
    keys = jax.random.split(key, len(cfg.resolutions) + 2)
    levels = []
    for lv, (k, r) in enumerate(zip(keys[:-2], cfg.resolutions)):
        levels.append(
            1e-2
            * jax.random.normal(k, (r, r, r, cfg.feat_of(lv)), jnp.float32)
        )
    params = {
        "levels": levels,
        "rgb_mlp": init_mlp(keys[-1], rgb_mlp_spec(cfg)),
    }
    if cfg.split:
        rs = cfg.sigma_res
        params["sigma_level"] = 1e-2 * jax.random.normal(
            keys[-2], (rs, rs, rs), jnp.float32
        )
    return params


def _upsample_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_in, n_out) trilinear-upsampling band matrix, pixel-center aligned
    with edge clamping (matches ``jax.image.resize`` linear semantics)."""
    pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    pos = jnp.clip(pos, 0.0, float(n_in - 1))
    m = jnp.arange(n_in, dtype=jnp.float32)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(m - pos[None, :]))


def _upsample3(g: jnp.ndarray, r_out: int) -> jnp.ndarray:
    """Trilinear-upsample (r, r, r, F) -> (r_out, r_out, r_out, F) as three
    separable 2-band matmuls (dense streaming / MXU; no gathers).

    Measured on v5e: a roll-select 2x upsampler ("pure streaming, no
    wasted flops on the band zeros") runs 2.5x SLOWER than these matmuls
    (29 vs 11 ms fwd at 256^3x8) — the even/odd interleave forces
    sublane/lane relayouts, while the MXU eats the dense band matrix at
    ~100 TFLOP/s.  Keep the matmul form, even at R=512."""
    w = _upsample_matrix(g.shape[0], r_out).astype(g.dtype)
    g = jnp.einsum("xyzf,xu->uyzf", g, w)
    g = jnp.einsum("xyzf,yu->xuzf", g, w)
    return jnp.einsum("xyzf,zu->xyuf", g, w)


def bake(
    params: Params, cfg: PyramidConfig, dtype=jnp.float32
) -> jnp.ndarray:
    """Fuse the pyramid into one (R, R, R, F) grid (dense streaming).

    Levels are accumulated *progressively* (each level upsampled to the
    next level's resolution, then added) so the heavy full-resolution pass
    runs once instead of once per level — ~4x less HBM traffic than
    resizing every level straight to ``R``.

    Channel 0 is exponentiated (TruncExp) at bake time so the baked grid
    carries *sigma*, not its logit: the renderer's resamples zero-pad
    outside the scene, and zero sigma is transparency while a zero logit
    would be unit density (fog).

    Split-resolution configs (``cfg.sigma_res``) return a tuple
    ``(sigma (Rs, Rs, Rs), feats (Rf, Rf, Rf, F-1))``: the pyramid's
    density-logit channel is upsampled to ``Rs`` and refined by the
    dedicated single-channel fine level before TruncExp.
    """
    R = cfg.grid_res
    out = None
    for g in params["levels"]:
        # ``dtype=bf16``: the whole progressive chain (upsample matmuls,
        # adds, TruncExp) runs in bf16 so the R^3*F live buffers AND
        # their backward cotangents are half-width — the HBM headroom
        # that makes R=512 training fit on one 16 GB chip
        g = g.astype(dtype)
        if out is not None and out.shape[0] != g.shape[0]:
            out = _upsample3(out, g.shape[0])
        if out is None:
            out = g
        elif g.shape[-1] < out.shape[-1]:
            # lean level: adds detail to sigma + the leading features
            out = jnp.concatenate(
                [out[..., : g.shape[-1]] + g, out[..., g.shape[-1] :]],
                axis=-1,
            )
        else:
            out = out + g
    if out.shape[0] != R:
        out = _upsample3(out, R)
    # forward logit ceiling: alpha saturates by sigma ~ 5e3 at the lattice
    # dt, but unbounded summed-level logits can reach e^29 (~8e9) on
    # under-observed floaters — finite in fp32 but NaN-adjacent through a
    # bf16 sweep at 800^2.  (TruncExp clamps only its BACKWARD, like the
    # reference's modules/networks.py:18-30.)
    cap = jnp.asarray(11.0, dtype)
    if cfg.split:
        logit = _upsample3(out[..., :1], cfg.sigma_res)[..., 0]
        logit = logit + params["sigma_level"].astype(dtype)
        sigma = trunc_exp(jnp.minimum(logit + cfg.sigma_bias, cap))
        return sigma, out[..., 1:]
    sigma = trunc_exp(jnp.minimum(out[..., 0] + cfg.sigma_bias, cap))
    return jnp.concatenate([sigma[..., None], out[..., 1:]], axis=-1)


bake_jit = jax.jit(bake, static_argnames=("cfg", "dtype"))


def density_from_grid(grid_slab: jnp.ndarray) -> jnp.ndarray:
    """Channel 0 of the baked grid is sigma already; clamp resample
    undershoot."""
    return jnp.maximum(grid_slab[..., 0], 0.0)


def rgb_from_features_enc(
    params: Params,
    cfg: PyramidConfig,
    feats: jnp.ndarray,
    d_enc: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(..., F-1) features + precomputed (..., 16) SH encoding -> rgb.

    Split out so callers shading many samples with shared directions (the
    slab sweep: one direction field per chunk) encode once, not per slab.
    """
    rgb_in = jnp.concatenate([d_enc, feats], axis=-1)
    return apply_mlp(
        params["rgb_mlp"], rgb_mlp_spec(cfg), rgb_in, compute_dtype
    ).astype(jnp.float32)


def rgb_from_features(
    params: Params,
    cfg: PyramidConfig,
    feats: jnp.ndarray,
    dirs: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(..., F-1) features + (..., 3) unit dirs -> (..., 3) rgb."""
    d_enc = sh_encode((dirs + 1.0) / 2.0)
    return rgb_from_features_enc(params, cfg, feats, d_enc, compute_dtype)
