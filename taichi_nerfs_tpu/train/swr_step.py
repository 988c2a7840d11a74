"""Training on the shear-warp renderer — image-crop SGD, fully dense.

Where the sample-gather path draws random *rays* (reference
datasets/base.py:34-61), the dense path draws a random training image and a
random square crop each step (a crop of a pinhole image is a pinhole image
with shifted principal point), renders it with the shear-warp renderer, and
takes the MSE against the ground-truth crop.  Everything — bake, sweep,
composite, MLP, backward — is dense streaming/MXU work.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import pyramid as pyr
from ..render.swr import render_swr_fixed_axis


@dataclasses.dataclass(frozen=True)
class SwrTrainConfig:
    crop: int = 128  # square crop side (rays per step = crop^2)
    lr: float = 1e-2
    lr_final_ratio: float = 1 / 30  # cosine floor (train.py:159-163)
    max_steps: int = 4000
    weight_decay: float = 0.0
    n_chunks: int = 16
    white_bg: bool = True
    # L1 sparsity on baked sigma: empty space stays empty (the dense path
    # has no occupancy grid; this is its pruning pressure)
    sigma_l1: float = 1e-5
    # total-variation regularization per pyramid level (the dense grid's
    # defence against floater overfitting, as in Plenoxels/DVGO); scaled by
    # each level's cell size so all levels feel comparable pressure
    tv_w: float = 3e-3
    # Mip-NeRF-360 distortion loss (reference --distortion_loss_w,
    # modules/distortion.py); computed inside the sweep from running sums
    distortion_w: float = 0.0
    # slab-resample matmul operand dtype ("float32" | "bfloat16"); fp32
    # accumulation either way.  Measured: a no-op on v5e — XLA's DEFAULT
    # matmul precision already runs fp32 dots as bf16 multiply passes, so
    # explicit bf16 produces bitwise-identical training metrics and no
    # speedup (only extra converts).  Kept for experimentation
    resample_dtype: str = "float32"
    # baked-grid dtype for the sweep ("float32" | "bfloat16").  bf16
    # halves the dominant R^3*F live buffers (grid + its cotangent) —
    # required headroom for R >= 512 training; sigma carries ~0.4%
    # relative error through the bf16 mantissa
    bake_dtype: str = "float32"
    # store adam's first moment in bf16 (R>=512 HBM headroom)
    adam_mu_bf16: bool = False
    # coarse-to-fine (DVGO/Plenoxels-style): prog_steps[i] steps are spent
    # with the pyramid truncated to its first
    # ``len(resolutions) - len(prog_steps) + i`` levels (the train lattice
    # is capped near the active grid resolution, so coarse steps are
    # ~4-8x cheaper); the remaining steps run the full pyramid.  Params and
    # adam moments of shared levels carry across phase boundaries
    # (``grow_swr_state``).  () = single-phase training
    prog_steps: Tuple[int, ...] = ()
    # inside-camera near margin (world units): slabs closer than this to
    # the camera along the sweep axis never composite.  Suppresses the
    # near-billboard floater mode (a near voxel covers a huge solid
    # angle); 0 = half a voxel.  Only affects inside-the-grid cameras
    near: float = 0.0
    # composite training pixels over per-pixel random background colors
    # instead of the dataset background (reference --random_bg).  Kills
    # the transparent-black shortcut: with a fixed white background and
    # content darker than white, the loss drives the rgb logits hard
    # negative before opacity forms and the color net saturates black
    # (measured: grayscale renders, MLP grads ~1e-33, ~15 dB cap on
    # enclosed inside-camera scenes).  For object datasets, pass the GT
    # alpha channel to ``SwrTrainer`` (4th image channel) and the GT is
    # re-composited over the same random background — without it the
    # flag assumes GT pixels are fully opaque (enclosed scenes).  This
    # is ALSO the dense path's floater killer on white-background object
    # scenes: a whitish floater over background pixels costs ~zero MSE
    # against a fixed white background (it matches the background), but
    # full loss against a random one (reference --random_bg semantics,
    # rendering.py:219-226)
    random_bg: bool = False
    # direct opacity supervision: alpha_w * mean((opacity - gt_alpha)^2).
    # Requires the GT alpha channel.  The blunt version of random_bg —
    # carves exactly the pixels whose rays should be empty
    alpha_w: float = 0.0
    # camera free-space carving (world units): voxels within this radius
    # of ANY training camera get sigma forced to 0 at bake time (train
    # and eval).  The watertight, per-voxel version of ``near`` — the
    # per-ray margin only masks each camera's own rays, so a fog/
    # billboard shell just outside the margin stays consistent across an
    # inside-the-scene rig (measured: 20-60 outward-facing cameras
    # converge to a proxy shell at the margin).  Physically grounded:
    # cameras move through free space (DVGO/F2-NeRF use the same prior).
    # 0 = off
    cam_carve: float = 0.0
    # slab-sweep implementation (render/swr.py render_swr_fixed_axis):
    # "auto" = fused Pallas chunk kernel on TPU when in scope, XLA scan
    # otherwise; "xla" / "pallas" / "pallas_interpret" force a path
    sweep_impl: str = "auto"
    # interpolation kernel for the sweep's slab/fold resamples
    # ("linear" | "cubic", ops/warp.py interp_kernel).  Cubic kills the
    # blur the tent chain accumulates (the round-4 quality plateau:
    # edge error dominates eval MSE and is set by the kernel, not the
    # field) at identical matmul cost.  Runs fused in the Pallas sweep
    # kernel (ops/swr_pallas.py builds either kind in-register); cubic
    # needs full-matrix resamples, so the trainer zeroes slab_window
    resample_kind: str = "linear"


class SwrTrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(cfg: SwrTrainConfig):
    sched = optax.cosine_decay_schedule(
        cfg.lr, cfg.max_steps, alpha=cfg.lr_final_ratio
    )
    # bf16 first moment at R>=512 scale: mu is pure EMA smoothing and
    # tolerates 8 mantissa bits; nu stays fp32 (its sqrt sets the step)
    mu_dt = jnp.bfloat16 if cfg.adam_mu_bf16 else None
    return optax.adam(sched, eps=1e-15, mu_dtype=mu_dt)


def create_swr_state(
    key: jax.Array, mcfg: pyr.PyramidConfig, tcfg: SwrTrainConfig
) -> SwrTrainState:
    k1, k2 = jax.random.split(key)
    params = pyr.init_pyramid_params(k1, mcfg)
    opt_state = make_optimizer(tcfg).init(params)
    return SwrTrainState(params=params, opt_state=opt_state, rng=k2)


def _grow_like_params(old, new):
    """Carry a params-structured pytree across a pyramid growth step.

    ``old`` comes from a truncated config, ``new`` from the grown one
    (freshly initialized); shared levels and every non-level entry keep the
    old values, newly added levels keep their fresh initialization."""
    out = dict(new)
    n_shared = len(old["levels"])
    out["levels"] = list(old["levels"]) + list(new["levels"][n_shared:])
    for k in old:
        if k != "levels":
            out[k] = old[k]
    return out


def grow_swr_state(
    state: SwrTrainState,
    new_mcfg: pyr.PyramidConfig,
    tcfg: SwrTrainConfig,
    key: jax.Array,
) -> SwrTrainState:
    """Grow a training state to a deeper pyramid config.

    New fine levels get their standard init and zero adam moments; shared
    levels and the rgb MLP keep both params and moments; schedule counts
    carry (one cosine schedule spans all phases)."""
    fresh_params = pyr.init_pyramid_params(key, new_mcfg)
    params = _grow_like_params(state.params, fresh_params)
    fresh_opt = make_optimizer(tcfg).init(params)
    grown = []
    for o, n in zip(state.opt_state, fresh_opt):
        if hasattr(o, "mu"):  # ScaleByAdamState
            n = n._replace(
                count=o.count,
                mu=_grow_like_params(o.mu, n.mu),
                nu=_grow_like_params(o.nu, n.nu),
            )
        elif hasattr(o, "count"):  # ScaleByScheduleState
            n = n._replace(count=o.count)
        grown.append(n)
    return SwrTrainState(params, tuple(grown), state.rng)


def apply_sigma_keep(grid, sigma_keep: jnp.ndarray):
    """Zero the baked grid's sigma channel where ``sigma_keep`` is 0."""
    if isinstance(grid, tuple):
        sigma, feats = grid
        return sigma * sigma_keep.astype(sigma.dtype), feats
    return jnp.concatenate(
        [grid[..., :1] * sigma_keep[..., None].astype(grid.dtype),
         grid[..., 1:]],
        axis=-1,
    )


def camera_keep_mask(
    poses: np.ndarray, res: int, carve: float, scale: float = 0.5
) -> np.ndarray:
    """(res, res, res) float32: 0 inside ``carve`` of any camera, else 1.

    The free-space prior behind ``SwrTrainConfig.cam_carve``: a voxel a
    training camera has been within ``carve`` of cannot be solid.
    """
    c = (np.arange(res, dtype=np.float32) + 0.5) / res * (2 * scale) - scale
    xx, yy, zz = np.meshgrid(c, c, c, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1)  # (R, R, R, 3)
    keep = np.ones((res, res, res), np.float32)
    for p in np.asarray(poses, np.float32).reshape(-1, 3, 4):
        d2 = ((pts - p[:, 3]) ** 2).sum(-1)
        keep *= (d2 > carve * carve).astype(np.float32)
    return keep


def make_swr_loss(
    gt_image: jnp.ndarray,  # (H, W, 3)
    pose: jnp.ndarray,  # (3, 4)
    K: jnp.ndarray,  # (3, 3)
    crop_xy: jnp.ndarray,  # (2,) int32 top-left (x, y)
    k_tv: jax.Array,
    mcfg: pyr.PyramidConfig,
    tcfg: SwrTrainConfig,
    axis: int,
    flip: bool,
    slab_window: int = 0,
    lat_size: int = 0,
    inside: bool = False,
    warp: str = "matmul",
    sigma_keep: jnp.ndarray | None = None,
    slope_bounds: jnp.ndarray | None = None,
):
    """Build ``loss_fn(params) -> (loss, mse)`` for one training crop.

    Shared by the single-chip step and the multi-chip (shard_map) step.
    ``lat_size`` caps the intermediate lattice (coarse-to-fine phases
    render through a lattice near the active grid resolution).
    ``inside`` trains a cubemap face of an inside-the-grid camera
    (render/swr.py): the sweep renders the face ``(axis, sign)`` and the
    MSE is masked to the crop pixels whose rays that face owns.
    """
    c = tcfg.crop
    x0 = crop_xy[0]
    y0 = crop_xy[1]
    n_ch = gt_image.shape[-1]  # 3 = rgb, 4 = rgba (GT alpha channel)
    gt = jax.lax.dynamic_slice(
        gt_image, (y0, x0, jnp.int32(0)), (c, c, n_ch)
    ).reshape(c * c, n_ch)
    if gt.dtype == jnp.uint8:  # device images stay 8-bit (4x HBM saved)
        gt = gt.astype(jnp.float32) / 255.0
    gt_alpha = gt[:, 3] if n_ch == 4 else None
    gt = gt[:, :3]
    # crop intrinsics: principal point shifts by the crop offset
    K_crop = K.at[0, 2].add(-x0.astype(jnp.float32))
    K_crop = K_crop.at[1, 2].add(-y0.astype(jnp.float32))

    def loss_fn(params):
        # remat the bake at large R: its forward intermediates (the
        # progressive upsample chain, ~R^3*F each) otherwise stay live
        # across the whole sweep for the backward pass.  bake_dtype=bf16
        # runs the whole chain (and so its cotangents) half-width.
        bake_dt = (
            jnp.bfloat16 if tcfg.bake_dtype == "bfloat16" else jnp.float32
        )
        bake_fn = (
            jax.checkpoint(pyr.bake, static_argnums=(1, 2))
            if mcfg.grid_res >= 384
            else pyr.bake
        )
        grid = bake_fn(params, mcfg, bake_dt)
        if sigma_keep is not None:
            # camera free-space carving (tcfg.cam_carve): zero sigma in
            # voxels a training camera has occupied
            grid = apply_sigma_keep(grid, sigma_keep)
        out = render_swr_fixed_axis(
            params,
            grid,
            mcfg,
            pose,
            K_crop,
            (c, c),
            axis,
            flip,
            n_chunks=min(tcfg.n_chunks, mcfg.grid_res),
            white_bg=tcfg.white_bg and not tcfg.random_bg,
            slab_window=slab_window,
            lat_size=lat_size,
            want_distortion=tcfg.distortion_w > 0,
            resample_dtype=tcfg.resample_dtype,
            inside=inside,
            near=tcfg.near,
            warp=warp,
            slope_bounds=slope_bounds,
            sweep_impl=tcfg.sweep_impl,
            resample_kind=tcfg.resample_kind,
        )
        rgb_pred = out["rgb"]
        gt_eff = gt
        if tcfg.random_bg:
            bg = jax.random.uniform(
                jax.random.fold_in(k_tv, 17), (c * c, 3)
            )
            rgb_pred = rgb_pred + (1.0 - out["opacity"])[:, None] * bg
            if gt_alpha is not None:
                # re-composite the GT over the same random background:
                # gt was stored composited over bg0 (white/black), so
                # gt_on_bg = gt + (1 - alpha) * (bg - bg0)
                bg0 = 1.0 if tcfg.white_bg else 0.0
                gt_eff = gt + (1.0 - gt_alpha)[:, None] * (bg - bg0)
        err = (rgb_pred - gt_eff) ** 2
        if inside:
            # mask to the face's pixels (same dirs as the renderer's
            # final warp, crop intrinsics)
            ui = jnp.arange(c, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(ui, ui, indexing="xy")
            d_cam = jnp.stack(
                [
                    (uu - K_crop[0, 2] + 0.5) / K_crop[0, 0],
                    (vv - K_crop[1, 2] + 0.5) / K_crop[1, 1],
                    jnp.ones_like(uu),
                ],
                axis=-1,
            )
            d_w = jnp.einsum("ij,hwj->hwi", pose[:, :3], d_cam)
            dom = jnp.argmax(jnp.abs(d_w), axis=-1)
            sign_ok = (d_w[..., axis] > 0) == (not flip)
            mask = ((dom == axis) & sign_ok).reshape(c * c).astype(
                jnp.float32
            )
            mse = jnp.sum(err * mask[:, None]) / jnp.maximum(
                3.0 * jnp.sum(mask), 1.0
            )
        else:
            mse = jnp.mean(err)
        loss = mse
        if tcfg.alpha_w > 0:
            assert gt_alpha is not None, (
                "alpha_w needs the GT alpha channel (SwrTrainer alphas=)"
            )
            a_err = (out["opacity"] - gt_alpha) ** 2
            if inside:
                a_mean = jnp.sum(a_err * mask) / jnp.maximum(
                    jnp.sum(mask), 1.0
                )
            else:
                a_mean = jnp.mean(a_err)
            loss = loss + tcfg.alpha_w * a_mean
        if tcfg.distortion_w > 0:
            if inside:
                dist = jnp.sum(out["distortion"] * mask) / jnp.maximum(
                    jnp.sum(mask), 1.0
                )
            else:
                dist = jnp.mean(out["distortion"])
            loss = loss + tcfg.distortion_w * dist
        if tcfg.sigma_l1 > 0:
            sigma = grid[0] if mcfg.split else grid[..., 0]
            loss = loss + tcfg.sigma_l1 * jnp.mean(sigma)
        if tcfg.tv_w > 0:
            tv = 0.0
            for g in params["levels"][:-1]:
                for ax in range(3):
                    d = jnp.diff(g, axis=ax)
                    tv = tv + jnp.mean(d * d)
            # finest level(s) dominate the cost: sample a random slab
            # window each step (Plenoxels-style stochastic TV, ~1/4 the
            # traffic); in split mode both the finest feature level and
            # the sigma level get windowed TV
            fines = [params["levels"][-1]]
            if mcfg.split:
                fines.append(params["sigma_level"][..., None])
            for i, fine in enumerate(fines):
                rf = fine.shape[0]
                win = max(rf // 4, 2)
                s0 = jax.random.randint(
                    jax.random.fold_in(k_tv, i), (), 0, rf - win + 1
                )
                sl = jax.lax.dynamic_slice_in_dim(fine, s0, win, axis=0)
                for ax in range(3):
                    d = jnp.diff(sl, axis=ax)
                    tv = tv + jnp.mean(d * d)
            loss = loss + tcfg.tv_w * tv
        return loss, mse

    return loss_fn


@partial(
    jax.jit,
    static_argnames=("mcfg", "tcfg", "axis", "flip", "slab_window",
                     "lat_size", "inside", "warp"),
    donate_argnames=("state",),
)
def swr_train_step(
    state: SwrTrainState,
    gt_image: jnp.ndarray,  # (H, W, 3)
    pose: jnp.ndarray,  # (3, 4)
    K: jnp.ndarray,  # (3, 3)
    crop_xy: jnp.ndarray,  # (2,) int32 top-left (x, y)
    mcfg: pyr.PyramidConfig,
    tcfg: SwrTrainConfig,
    axis: int,
    flip: bool,
    slab_window: int = 0,
    lat_size: int = 0,
    inside: bool = False,
    warp: str = "matmul",
    sigma_keep: jnp.ndarray | None = None,
    slope_bounds: jnp.ndarray | None = None,
) -> Tuple[SwrTrainState, Dict[str, jnp.ndarray]]:
    rng, k_tv = jax.random.split(state.rng)
    loss_fn = make_swr_loss(
        gt_image, pose, K, crop_xy, k_tv, mcfg, tcfg, axis, flip,
        slab_window, lat_size, inside, warp, sigma_keep, slope_bounds,
    )
    (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = make_optimizer(tcfg).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    metrics = {"loss": loss, "psnr": -10.0 * jnp.log10(mse)}
    return SwrTrainState(params, opt_state, rng), metrics


class SwrTrainer:
    """Host loop: image/crop sampling + static axis selection per pose."""

    def __init__(
        self,
        mcfg: pyr.PyramidConfig,
        tcfg: SwrTrainConfig,
        images: np.ndarray,  # (N, H*W, 3)
        poses: np.ndarray,  # (N, 3, 4)
        K: np.ndarray,
        img_wh: Tuple[int, int],
        seed: int = 23,
        mesh=None,
        alphas: np.ndarray | None = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — trains crop-parallel
        data-parallel over its ``data`` axis (``--num_devices``,
        parallel/swr_shard.py): one crop per chip, params replicated,
        grads pmean over ICI.  The sweep's (axis, flip[, face]) are static
        per program, so each sharded batch draws crops that share them.

        ``alphas``: optional (N, H*W) GT opacity — packed as a 4th uint8
        image channel; enables alpha-correct ``random_bg`` compositing
        and ``alpha_w`` opacity supervision (the datasets' RGBA alpha,
        which the reference blends away at load time)."""
        self.mesh = mesh
        self._sharded_steps = {}
        self.mcfg, self.tcfg = mcfg, tcfg
        w, h = img_wh
        # 8-bit on device: training data is 8-bit on disk anyway
        # (reference reads PNGs) and fp32 copies of a 100-view 800^2 rig
        # cost 768 MB of HBM; the crop slice upcasts in make_swr_loss
        imgs_f = np.asarray(images, np.float32).reshape(-1, h, w, 3)
        if alphas is not None:
            imgs_f = np.concatenate(
                [
                    imgs_f,
                    np.asarray(alphas, np.float32).reshape(-1, h, w, 1),
                ],
                axis=-1,
            )
        self.images = jnp.asarray(
            np.clip(imgs_f * 255.0 + 0.5, 0, 255).astype(np.uint8)
        )
        del imgs_f
        self.poses_np = np.asarray(poses, np.float32)
        self.poses = jnp.asarray(self.poses_np)
        self.K = jnp.asarray(K, jnp.float32)
        self.img_wh = img_wh
        self._host_rng = np.random.RandomState(seed)
        # static sweep parameters per training pose; poses inside the
        # grid train through the cubemap-face sweep (render/swr.py
        # `inside`) with a per-crop face pick + face-masked loss
        from ..render.swr import pixel_faces

        self._axis_flip = []
        self._inside = []
        self._face_map = []  # subsampled (dom, pos) for inside poses
        self._face_stride = max(1, min(img_wh) // 128)
        for p in self.poses_np:
            a = int(np.argmax(np.abs(p[:, 2])))
            ins = abs(float(p[a, 3])) <= mcfg.scale * 1.05
            self._axis_flip.append((a, bool(p[a, 3] > 0)))
            self._inside.append(ins)
            if ins:
                dom, pos, _, _ = pixel_faces(p, K, img_wh)
                st = self._face_stride
                self._face_map.append(
                    (dom[::st, ::st].astype(np.int8), pos[::st, ::st])
                )
            else:
                self._face_map.append(None)
        # coarse-to-fine phases: [(truncated mcfg, end_step), ...]; the
        # last phase is the full config and absorbs the remaining steps
        self._phases = []
        if tcfg.prog_steps:
            n_lvl = len(mcfg.resolutions)
            n_pro = len(tcfg.prog_steps)
            assert 0 < n_pro < n_lvl, "prog_steps longer than the pyramid"
            end = 0
            for i, st in enumerate(tcfg.prog_steps):
                end += st
                self._phases.append(
                    (pyr.truncate(mcfg, n_lvl - n_pro + i), end)
                )
        self._phases.append((mcfg, tcfg.max_steps))
        self.step = 0
        self._activate_phase(0, jax.random.PRNGKey(seed))

    def _activate_phase(self, idx: int, key: jax.Array):
        from ..render.swr import slab_window_bound

        pm = self._phases[idx][0]
        self._phase_idx = idx
        self.cur_mcfg = pm
        # the train lattice only needs to resolve the active grid: cap it
        # near 1.25 R (as eval does) while the pyramid is coarse
        lat_pad = 16
        cap = int(1.25 * pm.grid_res) + lat_pad
        self.lat_size = cap if cap < self.tcfg.crop + lat_pad else 0
        outside = [
            p for p, ins in zip(self.poses_np, self._inside) if not ins
        ]
        self.slab_window = (
            slab_window_bound(
                np.stack(outside), np.asarray(self.K), self.img_wh, pm,
                crop=self.tcfg.crop, lat_size=self.lat_size,
            )
            if outside and self.tcfg.resample_kind == "linear"
            else 0  # inside sweeps + cubic kernels use the full matmul
        )
        if self.tcfg.cam_carve > 0:
            res = pm.sigma_res if pm.split else pm.grid_res
            self.sigma_keep = jnp.asarray(
                camera_keep_mask(
                    self.poses_np, res, self.tcfg.cam_carve, pm.scale
                )
            )
        else:
            self.sigma_keep = None
        self._grid_cache = (None, None)
        if idx == 0:
            self.state = create_swr_state(key, pm, self.tcfg)
        else:
            self.state = grow_swr_state(self.state, pm, self.tcfg, key)
        if self.mesh is not None:
            from ..parallel.swr_shard import shard_swr_state

            self.state = shard_swr_state(self.state, self.mesh)
            self._sharded_steps = {}  # programs are per-phase (mcfg)

    def save_state(self, path: str, light: bool = True):
        """Checkpoint for resume.

        ``light`` (default): bf16 params + rng + step + phase + crop-rng
        — on resume the optimizer re-initializes with its step counts
        fast-forwarded (zeroed moments at the right cosine-lr point).
        Full mode adds the fp32 adam moments for resume-exactness, but a
        tunneled chip reads back at ~25 MB/s, so a full R=512 state
        (~10 GB) costs minutes per save; light is ~1.4 GB.
        """
        import pickle

        st = self.state
        payload = {
            "step": self.step,
            "phase": self._phase_idx,
            "host_rng": self._host_rng.get_state(),
            "rng": jax.device_get(st.rng),
        }
        if light:
            # leaf-by-leaf fp32 transfer, cast on host: any device-side
            # staging copy next to a full R=512 training state OOMs
            import ml_dtypes

            def fetch(a):
                return jax.device_get(a).astype(ml_dtypes.bfloat16)

            payload["params_bf16"] = jax.tree_util.tree_map(
                fetch, st.params
            )
        else:
            payload["state"] = jax.device_get(st)
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_state(self, path: str):
        import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        # replay phase activations so lattice/slab-window/sigma-keep
        # match the saved phase, then overwrite the state it created
        while self._phase_idx < d["phase"]:
            self._activate_phase(
                self._phase_idx + 1,
                jax.random.fold_in(
                    jax.random.PRNGKey(23), self._phase_idx + 1
                ),
            )
        if "state" in d:
            st = SwrTrainState(*d["state"])
        else:
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float32),
                d["params_bf16"],
            )
            opt_state = make_optimizer(self.tcfg).init(params)
            # fast-forward the SCHEDULE count to the saved step (cosine
            # lr resumes where it left off); adam's own count stays 0 so
            # bias correction ramps the fresh moments in gently
            ff = []
            for o in opt_state:
                if hasattr(o, "count") and not hasattr(o, "mu"):
                    o = o._replace(
                        count=jnp.asarray(d["step"], jnp.int32)
                    )
                ff.append(o)
            st = SwrTrainState(params, tuple(ff), jnp.asarray(d["rng"]))
        if self.mesh is not None:
            from ..parallel.swr_shard import shard_swr_state

            st = shard_swr_state(st, self.mesh)
        else:
            st = jax.device_put(st)
        self.state = st
        self.step = d["step"]
        if "host_rng" in d:  # crop-draw sequence continues, not repeats
            self._host_rng.set_state(d["host_rng"])
        self._grid_cache = (None, None)

    def load_npz(self, path: str):
        """Load params saved by train.py's ``model_pyramid.npz`` export
        (the pyramid path's --ckpt_path).  Jumps the trainer to the final
        (full-depth) coarse-to-fine phase so the loaded levels fit."""
        d = np.load(path)
        levels = []
        i = 0
        while f"level_{i}" in d:
            levels.append(jnp.asarray(d[f"level_{i}"]))
            i += 1
        assert levels, f"no pyramid levels in {path}"
        params = {
            "levels": levels,
            "rgb_mlp": {
                k[len("rgb_mlp_"):]: jnp.asarray(d[k])
                for k in d.files
                if k.startswith("rgb_mlp_")
            },
        }
        if "sigma_level" in d:
            params["sigma_level"] = jnp.asarray(d["sigma_level"])
        while self._phase_idx + 1 < len(self._phases):
            self._activate_phase(
                self._phase_idx + 1,
                jax.random.fold_in(
                    jax.random.PRNGKey(23), self._phase_idx + 1
                ),
            )
        exp = [g.shape for g in self.state.params["levels"]]
        got = [g.shape for g in levels]
        assert exp == got, f"ckpt level shapes {got} != config {exp}"
        self.state = SwrTrainState(
            params,
            make_optimizer(self.tcfg).init(params),
            self.state.rng,
        )
        if self.mesh is not None:
            from ..parallel.swr_shard import shard_swr_state

            self.state = shard_swr_state(self.state, self.mesh)
        self._grid_cache = (None, None)

    def run_step(self):
        while (
            self._phase_idx + 1 < len(self._phases)
            and self.step >= self._phases[self._phase_idx][1]
        ):
            self._activate_phase(
                self._phase_idx + 1,
                jax.random.fold_in(
                    jax.random.PRNGKey(23), self._phase_idx + 1
                ),
            )
        if self.mesh is not None:
            return self._run_step_sharded()
        w, h = self.img_wh
        c = self.tcfg.crop
        i = self._host_rng.randint(len(self.poses_np))
        x0 = self._host_rng.randint(max(w - c, 0) + 1)
        y0 = self._host_rng.randint(max(h - c, 0) + 1)
        inside = self._inside[i]
        slope_bounds = None
        if inside:
            # sample the training face by pixel share over the crop
            # (subsampled face map); pixels of other faces are masked out
            # of the loss.  A deterministic majority pick would leave each
            # view's minority-face pixels out of every loss forever
            dom, pos = self._face_map[i]
            st = self._face_stride
            sd = dom[y0 // st : (y0 + c) // st + 1,
                     x0 // st : (x0 + c) // st + 1]
            sp = pos[y0 // st : (y0 + c) // st + 1,
                     x0 // st : (x0 + c) // st + 1]
            ids = (sd.astype(np.int64) * 2 + sp).ravel()
            counts = np.bincount(ids, minlength=6).astype(np.float64)
            face = int(
                self._host_rng.choice(6, p=counts / counts.sum())
            )
            axis, flip = face // 2, not bool(face % 2)
        else:
            axis, flip = self._axis_flip[i]
        from ..render.swr import face_slope_bounds, pick_warp

        if inside:
            # tight per-crop slope bounds for the trained face (host
            # numbers, traced values — no retrace churn); the in-trace
            # fallback is cone-wide for multi-face crops and blurs the
            # training render ~4x relative to eval
            b = face_slope_bounds(
                self.poses_np[i],
                np.asarray(self.K),
                (c, c),
                axis,
                -1.0 if flip else 1.0,
                crop_xy=(x0, y0),
            )
            if b is not None:
                slope_bounds = jnp.asarray(b, jnp.float32)

        # static per-crop solve-coordinate pick for the matmul warp
        # (render/swr.py _matmul_solve_choice) — at most 3 variants per
        # (axis, flip, inside) program bucket
        if slope_bounds is not None:
            from ..render.swr import _matmul_solve_choice

            warp = _matmul_solve_choice(
                self.poses_np[i], axis, float(b[1, 0]), float(b[1, 1])
            )
        else:
            warp = pick_warp(
                self.poses_np[i],
                np.asarray(self.K),
                (c, c),
                axis,
                face_sign=(
                    (-1.0 if flip else 1.0) if inside else None
                ),
                crop_xy=(x0, y0),
            )
        self.state, metrics = swr_train_step(
            self.state,
            self.images[i],
            self.poses[i],
            self.K,
            jnp.asarray([x0, y0], jnp.int32),
            self.cur_mcfg,
            self.tcfg,
            axis,
            flip,
            slab_window=0 if inside else self.slab_window,
            lat_size=self.lat_size,
            inside=inside,
            warp=warp,
            sigma_keep=self.sigma_keep,
            slope_bounds=slope_bounds,
        )
        self.step += 1
        return metrics

    def _run_step_sharded(self):
        """Crop-parallel DP step: one crop per chip (parallel/swr_shard.py).

        All crops in a batch share the sweep's static config — (axis,
        flip) for outside cameras (drawn from the same dominant-axis pose
        group), or one cubemap face of one pose for inside cameras (the
        loss is face-masked per crop, so windows that miss the face
        contribute zero gradient, never wrong gradient)."""
        from ..parallel.swr_shard import (
            make_swr_sharded_step,
            shard_swr_batch,
        )
        from ..render.swr import (
            _matmul_solve_choice,
            face_slope_bounds,
            pick_warp,
        )

        mesh = self.mesh
        n_dev = mesh.devices.size
        w, h = self.img_wh
        c = self.tcfg.crop

        def draw_window():
            return (
                self._host_rng.randint(max(w - c, 0) + 1),
                self._host_rng.randint(max(h - c, 0) + 1),
            )

        i0 = self._host_rng.randint(len(self.poses_np))
        inside = self._inside[i0]
        wins = [draw_window() for _ in range(n_dev)]
        if inside:
            idxs = [i0] * n_dev  # same pose, n_dev windows, one face
            x0, y0 = wins[0]
            dom, pos = self._face_map[i0]
            st = self._face_stride
            sd = dom[y0 // st : (y0 + c) // st + 1,
                     x0 // st : (x0 + c) // st + 1]
            sp = pos[y0 // st : (y0 + c) // st + 1,
                     x0 // st : (x0 + c) // st + 1]
            ids = (sd.astype(np.int64) * 2 + sp).ravel()
            counts = np.bincount(ids, minlength=6).astype(np.float64)
            face = int(self._host_rng.choice(6, p=counts / counts.sum()))
            axis, flip = face // 2, not bool(face % 2)
        else:
            axis, flip = self._axis_flip[i0]
            pool = [
                j
                for j, (af, ins) in enumerate(
                    zip(self._axis_flip, self._inside)
                )
                if af == (axis, flip) and not ins
            ]
            idxs = [i0] + [
                pool[self._host_rng.randint(len(pool))]
                for _ in range(n_dev - 1)
            ]

        slope_list = None
        if inside:
            slope_list = []
            for j, (x0, y0) in zip(idxs, wins):
                b = face_slope_bounds(
                    self.poses_np[j], np.asarray(self.K), (c, c),
                    axis, -1.0 if flip else 1.0, crop_xy=(x0, y0),
                )
                if b is None:  # cone-wide fallback for the whole batch
                    slope_list = None
                    break
                slope_list.append(np.asarray(b, np.float32))
        if slope_list:
            b0 = slope_list[0]
            warp = _matmul_solve_choice(
                self.poses_np[i0], axis, float(b0[1, 0]), float(b0[1, 1])
            )
        else:
            warp = pick_warp(
                self.poses_np[i0],
                np.asarray(self.K),
                (c, c),
                axis,
                face_sign=((-1.0 if flip else 1.0) if inside else None),
                crop_xy=wins[0],
            )

        with_sk = self.sigma_keep is not None
        with_sb = bool(slope_list)
        slab_window = 0 if inside else self.slab_window
        key = (
            self._phase_idx, axis, flip, inside, warp,
            slab_window, self.lat_size, with_sk, with_sb,
        )
        fn = self._sharded_steps.get(key)
        if fn is None:
            fn = make_swr_sharded_step(
                self.cur_mcfg, self.tcfg, mesh, axis, flip,
                slab_window=slab_window, warp=warp, inside=inside,
                lat_size=self.lat_size, with_sigma_keep=with_sk,
                with_slope_bounds=with_sb,
            )
            self._sharded_steps[key] = fn

        imgs = jnp.take(self.images, jnp.asarray(idxs, jnp.int32), axis=0)
        poses = jnp.asarray(self.poses_np[idxs])
        Ks = jnp.broadcast_to(self.K, (n_dev, 3, 3))
        xy = jnp.asarray(np.asarray(wins, np.int32))
        args = shard_swr_batch(mesh, imgs, poses, Ks, xy)
        extras = ()
        if with_sk:
            extras += (self.sigma_keep,)  # replicated (in_specs P())
        if with_sb:
            extras += shard_swr_batch(
                mesh, jnp.asarray(np.stack(slope_list))
            )
        self.state, metrics = fn(self.state, *args, *extras)
        self.step += 1
        return metrics

    def fit(self, max_steps=None, log_every: int = 500, log_fn=print):
        import time

        max_steps = max_steps or self.tcfg.max_steps
        tic = time.time()
        m = None
        for _ in range(max_steps):
            m = self.run_step()
            if (self.step - 1) % log_every == 0:
                mm = jax.device_get(m)
                log_fn(
                    f"elapsed_time={time.time() - tic:.2f}s | "
                    f"step={self.step - 1} | "
                    f"psnr={float(mm['psnr']):.2f} | "
                    f"loss={float(mm['loss']):.6f}"
                )
        return m

    def render(self, pose, K=None, img_wh=None, lat_cap="auto",
               early_exit=1e-4):
        """Eval-time render.  ``early_exit`` cuts the sweep once every
        pixel's transmittance is below it (the reference test path's
        T_threshold semantics, rendering.py:18) — error bounded by the
        threshold; pass 0.0 for the exact full sweep."""
        from ..render.swr import render_swr, render_swr_inside

        # bake once per training step, not once per rendered view
        if getattr(self, "_grid_cache", (None, None))[0] != self.step:
            baked = pyr.bake_jit(
                self.state.params,
                self.cur_mcfg,
                dtype=(
                    jnp.bfloat16
                    if self.tcfg.bake_dtype == "bfloat16"
                    else jnp.float32
                ),
            )
            if self.sigma_keep is not None:
                baked = apply_sigma_keep(baked, self.sigma_keep)
            self._grid_cache = (self.step, baked)
        grid = self._grid_cache[1]
        if lat_cap == "auto":
            lat_cap = int(1.25 * self.cur_mcfg.grid_res) + 16
        pose_np = np.asarray(pose, np.float32).reshape(3, 4)
        a = int(np.argmax(np.abs(pose_np[:, 2])))
        fn = (
            render_swr_inside
            if abs(float(pose_np[a, 3])) <= self.cur_mcfg.scale * 1.05
            else render_swr
        )
        kw = {}
        if fn is render_swr and early_exit:
            kw["early_exit"] = float(early_exit)
        if self.tcfg.resample_kind != "linear":
            kw["resample_kind"] = self.tcfg.resample_kind
        return fn(
            self.state.params,
            grid,
            self.cur_mcfg,
            pose,
            self.K if K is None else K,
            img_wh or self.img_wh,
            n_chunks=min(self.tcfg.n_chunks, self.cur_mcfg.grid_res),
            white_bg=self.tcfg.white_bg,
            lat_cap=lat_cap,
            skip_empty=True,
            near=self.tcfg.near,
            **kw,
        )
