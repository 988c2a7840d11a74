"""Serialized compiled-artifact export (AOT): the TPU-era counterpart of
the reference's ``deployment/InstantNGP/taichi_ngp/compiled/`` directory
(per-kernel ``.spv`` SPIR-V + ``metadata.json`` + ``graphs.json``), which
its C++ runner consumes cold without Python or a compiler.

On TPU the unit of deployment is not a kernel but a whole XLA program:
``jax.export`` serializes the lowered StableHLO of a jitted function into
a versioned, self-describing artifact that any later process (same or
newer jax, matching platform) can deserialize and execute WITHOUT
re-tracing the Python — the role ``ti.aot.Module.save`` plays at
``taichi_ngp.py:89-104``.  We ship one artifact per entry point plus a
``metadata.json`` describing the calling convention (in/out avals,
platforms, version), mirroring the reference's metadata/graphs split.

Layout written by :func:`export_compiled`::

    <out_dir>/
      <name>.stablehlo.bin   # jax.export serialization (versioned)
      metadata.json          # ABI: arg/result avals, platforms, versions

The native C++ runner (``native/``) remains the *portable* deployment
path (re-implements inference against the tagged .bin weights); this
module is the *compiled* path for TPU/CPU hosts running a JAX runtime —
the split is documented in ``docs/deployment.md``.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import numpy as np


def _aval_desc(a) -> dict:
    return {"shape": list(a.shape), "dtype": str(a.dtype)}


def export_compiled(
    fn: Callable,
    example_args: Sequence,
    out_dir: str,
    name: str = "render",
    platforms: Sequence[str] | None = None,
    extra_meta: dict | None = None,
) -> str:
    """Serialize ``jit(fn)`` lowered for ``platforms`` into ``out_dir``.

    ``example_args``: pytree of arrays / ShapeDtypeStructs fixing the
    ABI (shapes + dtypes are static, like the reference's per-kernel
    ndarray arg lists in ``metadata.json``).
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct)
        else x,
        list(example_args),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exp = jexport.export(jax.jit(fn), **kwargs)(*specs)
    blob = exp.serialize()
    bin_path = os.path.join(out_dir, f"{name}.stablehlo.bin")
    with open(bin_path, "wb") as f:
        f.write(bytes(blob))

    meta_path = os.path.join(out_dir, "metadata.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta[name] = {
        "file": os.path.basename(bin_path),
        "platforms": list(exp.platforms),
        "calling_convention_version": exp.calling_convention_version,
        "jax_version": jax.__version__,
        "in_avals": [_aval_desc(a) for a in exp.in_avals],
        "out_avals": [_aval_desc(a) for a in exp.out_avals],
        **(extra_meta or {}),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2)
    return bin_path


def load_compiled(out_dir: str, name: str = "render") -> Callable:
    """Deserialize an exported entry point; returns a callable running
    the serialized program (no re-trace of the defining Python)."""
    from jax import export as jexport

    with open(os.path.join(out_dir, f"{name}.stablehlo.bin"), "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def export_pyramid_compiled(
    params,
    pyramid_cfg,
    K,
    img_wh,
    out_dir: str,
    platforms: Sequence[str] | None = None,
    white_bg: bool = True,
    lat_cap: int | None = None,
) -> str:
    """AOT-compile the dense-pyramid inference path.

    The sweep axis/direction is a *static* program property (the whole
    slab schedule specializes on it), so the artifact holds SIX entry
    points ``pyramid_render_a{axis}f{flip}`` — one per (dominant axis,
    sweep direction) — and the runtime picks by a 3-element argmax on
    the pose, exactly as the reference's C++ runner picks among its 11
    AOT kernels per phase (app_fp32.cpp:171-244).  Camera intrinsics and
    render config are baked in as constants (the reference bakes them
    into its AOT kernels the same way, kernels.py:33-66); the *weights*
    (baked grid + rgb MLP) stay runtime inputs — swap checkpoints
    without re-exporting, as the reference re-uploads ``.bin`` weights
    against fixed kernels.  The final pixel warp is the gather form:
    pose-agnostic conditioning (the matmul warp's solve choice is
    per-pose, host-side).
    """
    import jax.numpy as jnp

    from ..models import pyramid as pyr
    from ..render.swr import render_swr_fixed_axis

    if lat_cap is None:
        lat_cap = int(1.25 * pyramid_cfg.grid_res) + 16
    K = np.asarray(K, np.float32)
    w, h = img_wh
    lat_pad = 16
    kw = {}
    if max(img_wh) + lat_pad > lat_cap:
        kw["lat_size"] = lat_cap

    grid = pyr.bake_jit(params, pyramid_cfg)
    pose0 = jax.ShapeDtypeStruct((3, 4), np.float32)
    path = None
    for axis in range(3):
        for flip in (False, True):

            def infer(g, rgb_mlp, pose, axis=axis, flip=flip):
                return render_swr_fixed_axis(
                    {"rgb_mlp": rgb_mlp},
                    g,
                    pyramid_cfg,
                    pose,
                    jnp.asarray(K),
                    (w, h),
                    axis,
                    flip,
                    white_bg=white_bg,
                    skip_empty=True,
                    warp="gather",
                    **kw,
                )

            path = export_compiled(
                infer,
                [grid, params["rgb_mlp"], pose0],
                out_dir,
                name=f"pyramid_render_a{axis}f{int(flip)}",
                platforms=platforms,
                extra_meta={
                    "model": "pyramid",
                    "axis": axis,
                    "flip": bool(flip),
                    "grid_res": int(pyramid_cfg.grid_res),
                    "scale": float(pyramid_cfg.scale),
                    "img_wh": [int(w), int(h)],
                    "white_bg": bool(white_bg),
                    "lat_cap": int(lat_cap),
                },
            )
    return os.path.dirname(path)


def load_pyramid_renderer(out_dir: str) -> Callable:
    """Load all six AOT entry points; returns ``f(grid, rgb_mlp, pose)``
    dispatching on the pose's dominant axis/side (host argmax — the same
    role as the reference runner's per-frame kernel selection)."""
    fns = {
        (a, f): load_compiled(out_dir, f"pyramid_render_a{a}f{f}")
        for a in range(3)
        for f in (0, 1)
    }
    with open(os.path.join(out_dir, "metadata.json")) as f:
        meta = json.load(f)
    scale = float(meta.get("pyramid_render_a0f0", {}).get("scale", 0.5))

    def render(grid, rgb_mlp, pose):
        p = np.asarray(pose, np.float32).reshape(3, 4)
        axis = int(np.argmax(np.abs(p[:, 2])))
        flip = int(p[axis, 3] > 0)
        # the exported entry points are the OUTSIDE sweep: the shadow-
        # frame intersection assumes the camera clears the expanded cube
        # along the sweep axis.  An inside pose would render a collapsed
        # one-sided frame with no error — refuse it loudly (mirrors
        # SwrTrainer.render's inside/outside dispatch, which the AOT
        # artifact does not carry)
        if abs(float(p[axis, 3])) <= scale * 1.05:
            raise ValueError(
                f"pose is inside the grid along its dominant axis "
                f"(|o_a|={abs(float(p[axis, 3])):.3f} <= "
                f"{scale * 1.05:.3f}); the AOT artifact only serves "
                "outside cameras — render inside poses with "
                "SwrTrainer.render (cubemap-face sweep)"
            )
        return fns[(axis, flip)](grid, rgb_mlp, p)

    return render
