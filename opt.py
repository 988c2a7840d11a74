"""CLI flags — public API preserved from the reference (opt.py:4-134).

Every flag the reference exposes is accepted here with the same name,
default, and choices; ``get_opts`` additionally converts the namespace into
the framework's typed :class:`taichi_nerfs_tpu.config.Config`.
"""

from __future__ import annotations

import argparse


def get_opts(prefix_args=None):
    parser = argparse.ArgumentParser()

    # dataset parameters
    parser.add_argument("--root_dir", type=str, required=True,
                        help="root directory of dataset")
    parser.add_argument("--dataset_name", type=str, default="nsvf",
                        choices=["nerf", "nsvf", "colmap", "ngp", "synthetic"],
                        help="which dataset to train/test")
    parser.add_argument("--split", type=str, default="train",
                        choices=["train", "trainval", "trainvaltest"],
                        help="use which split to train")
    parser.add_argument("--downsample", type=float, default=1.0,
                        help="downsample factor (<=1.0) for the images")

    # model parameters
    parser.add_argument("--model_name", type=str, default="ngp",
                        choices=["ngp", "svox", "pyramid"],
                        help="which model to train/test (pyramid = dense grid on the gather-free shear-warp renderer, TPU flagship)")
    parser.add_argument("--scale", type=float, default=0.5,
                        help="scene scale (whole scene must lie in "
                             "[-scale, scale]^3")
    parser.add_argument("--half_opt", action="store_true", default=False,
                        help="half-precision (bf16) hash table")
    parser.add_argument("--shading", type=str, default="deferred",
                        choices=["deferred", "per_sample"],
                        help="pyramid model: 'deferred' (SNeRG-style — "
                             "composite features, one rgb-MLP eval per "
                             "pixel; measured quality-parity, ~15%% "
                             "faster steps, much faster compile) or "
                             "'per_sample' (shade every slab sample, the "
                             "reference's semantics)")
    parser.add_argument("--pyramid_levels", type=str, default="",
                        help="pyramid model: comma-separated level "
                             "resolutions (default 32,64,128,256); e.g. "
                             "32,64,128,256,512 for the R=512 quality "
                             "config")
    parser.add_argument("--fine_features", type=int, default=0,
                        help="pyramid model: channel width of the FINEST "
                             "level only (lean top level, e.g. 4 at "
                             "512^3); 0 = same as --features")
    parser.add_argument("--bake_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="pyramid model: baked-grid dtype for the "
                             "sweep; bfloat16 halves the R^3*F live "
                             "buffers (needed for R>=512 training)")
    parser.add_argument("--features", type=int, default=16,
                        help="pyramid model: channels per pyramid level "
                             "(1 density + F-1 appearance).  Measured on "
                             "the 800^2 checker proxy: 16 is +2.2 dB "
                             "over 8 at ~1.4x step cost; 24 +2.8 dB at "
                             "~1.8x; 32 exceeds HBM with fp32 adam state")
    parser.add_argument("--sigma_res", type=int, default=0,
                        help="pyramid model: optional single-channel "
                             "density level at 2x the finest feature "
                             "level (512 doubles silhouette resolution "
                             "at ~1/8 the memory of a full level); 0 "
                             "disables")
    parser.add_argument("--prog_steps", type=str, default="auto",
                        help="pyramid model: coarse-to-fine phase "
                             "lengths, comma-separated (one entry per "
                             "truncated pyramid depth, finest phase "
                             "takes the rest).  'auto' scales the "
                             "measured-best (1500,1800)@8000 schedule "
                             "to --max_steps; '' disables.  Measured "
                             "(800^2 checker, 200 views): 39.4 eval "
                             "PSNR @ 590 s vs 29.0 @ 411 s single-phase")
    parser.add_argument("--cam_carve", type=float, default=0.0,
                        help="pyramid model: camera free-space carving "
                             "radius (world units) — voxels within it of "
                             "any training camera bake to sigma 0. "
                             "Counters the near-billboard attractor of "
                             "inside-the-scene rigs; 0 disables")
    parser.add_argument("--near_margin", type=float, default=0.0,
                        help="pyramid model: inside-camera near margin "
                             "(world units) along the sweep axis; 0 = "
                             "half a voxel")
    parser.add_argument("--encoder_type", type=str, default="brick",
                        choices=["hash", "triplane", "brick"],
                        help="which encoder to use (brick = TPU-native "
                        "row-gather layout, fastest on TPU)")
    parser.add_argument("--brick_shape", type=str, default="8x4",
                        help="brick-encoder ladder as LEVELSxF, e.g. 8x4 "
                             "(default, the recorded parity layout) or "
                             "4x8 (half the gather/scatter rows, +37%% "
                             "rays/s, -0.65 dB at equal steps — the "
                             "measured trade in docs/parity_trade_r5"
                             ".json; pair with --half_opt for 128 B "
                             "rows)")
    parser.add_argument("--sh_degree", type=int, default=2,
                        help="degree of spherical harmonics (svox)")
    parser.add_argument("--grid_size", type=int, default=256,
                        help="size of voxel grid in each dimension (svox)")
    parser.add_argument("--grid_radius", type=float, default=0.0125,
                        help="radius of voxel grid points (svox)")
    parser.add_argument("--origin_sh", type=float, default=0.0,
                        help="initial sh coeff value in voxel grid (svox)")
    parser.add_argument("--origin_sigma", type=float, default=0.1,
                        help="initial sigma value in voxel grid (svox)")

    parser.add_argument("--level_features", type=str, default="",
                        help="pyramid model: explicit comma list of "
                             "per-level channel widths (overrides "
                             "--features/--fine_features), e.g. 8,8,8,8")
    parser.add_argument("--resample_kind", type=str, default="linear",
                        choices=["linear", "cubic"],
                        help="pyramid model: sweep interpolation kernel. "
                             "cubic = Catmull-Rom, sharper reconstruction "
                             "at identical matmul cost (the record "
                             "config); runs fused in the Pallas sweep "
                             "kernel on TPU")

    # loss parameters
    parser.add_argument("--distortion_loss_w", type=float, default=0,
                        help="weight of distortion loss; 0 disables; good "
                             "values: 1e-3 (real), 1e-2 (synthetic)")
    parser.add_argument("--tv_w", type=float, default=3e-3,
                        help="pyramid model: total-variation weight per "
                             "level (floater defence; record config uses "
                             "5e-4)")
    parser.add_argument("--sigma_l1", type=float, default=1e-5,
                        help="pyramid model: L1 sparsity on baked sigma "
                             "(dense-path pruning pressure)")
    parser.add_argument("--alpha_w", type=float, default=0.0,
                        help="pyramid model: direct opacity-vs-GT-alpha "
                             "supervision weight (needs a dataset with "
                             "an alpha channel; the record config uses "
                             "0.2 with --random_bg)")

    # training options
    parser.add_argument("--batch_size", type=int, default=8192,
                        help="number of rays in a batch")
    parser.add_argument("--ray_sampling_strategy", type=str,
                        default="all_images",
                        choices=["all_images", "same_image"])
    parser.add_argument("--max_steps", type=int, default=20000,
                        help="number of steps to train")
    parser.add_argument("--lr", type=float, default=1e-2,
                        help="learning rate")
    parser.add_argument("--random_bg", action="store_true", default=False,
                        help="train with random bg color (real scenes)")

    # misc
    parser.add_argument("--exp_name", type=str, default="exp",
                        help="experiment name")
    parser.add_argument("--gpu", type=int, default=0,
                        help="device index (kept for API compat)")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="data-parallel devices (0 = all available)")
    parser.add_argument("--ckpt_path", type=str, default=None,
                        help="checkpoint to load (params + optimizer + grid)")
    parser.add_argument("--gui", action="store_true", default=False,
                        help="open the interactive viewer after training")
    parser.add_argument("--eval_views", type=int, default=0,
                        help="cap the number of evaluated test views "
                             "(0 = all); quality records use all")
    parser.add_argument("--val_only", action="store_true", default=False,
                        help="skip training; evaluate a checkpoint")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler (XProf/TensorBoard) "
                             "trace of the training loop here, and print "
                             "per-phase wall-clock with the telemetry; "
                             "'' disables (no reference counterpart — "
                             "SURVEY.md §5 tracing is greenfield)")
    # deployment
    parser.add_argument("--deployment", action="store_true", default=False)
    parser.add_argument("--deployment_model_path", type=str, default="./")

    return parser.parse_args(prefix_args)


def config_from_opts(hparams):
    """Mirror the reference's config selection (train.py:54,87-117)."""
    from taichi_nerfs_tpu.config import (
        RenderConfig,
        TrainConfig,
        config_for_scene,
        deployment_model_config,
    )

    cfg = config_for_scene(
        scale=hparams.scale,
        root_dir=hparams.root_dir,
        dataset_name=hparams.dataset_name,
        split=hparams.split,
        downsample=hparams.downsample,
        exp_name=hparams.exp_name,
        ckpt_path=hparams.ckpt_path,
    )
    if hparams.deployment:
        cfg = cfg.replace(model=deployment_model_config(hparams.scale))
    import dataclasses as _dc

    model = cfg.model.replace(
        name=hparams.model_name,
        pos_encoder_type=hparams.encoder_type,
        mlp_dtype="bfloat16" if hparams.half_opt else cfg.model.mlp_dtype,
        grid=_dc.replace(
            cfg.model.grid,
            table_dtype="bfloat16" if hparams.half_opt else "float32",
        ),
        brick=_dc.replace(
            cfg.model.brick,
            table_dtype="bfloat16" if hparams.half_opt else "float32",
            levels=int(hparams.brick_shape.split("x")[0]),
            feature_per_level=int(hparams.brick_shape.split("x")[1]),
        ),
        voxel_grid_size=hparams.grid_size,
        voxel_radius=hparams.grid_radius,
        voxel_sh_degree=hparams.sh_degree,
        voxel_origin_sh=hparams.origin_sh,
        voxel_origin_sigma=hparams.origin_sigma,
    )
    exp_step_factor = 1 / 256 if hparams.scale > 0.5 else 0.0
    render = RenderConfig(
        exp_step_factor=exp_step_factor,
        white_bg=(exp_step_factor == 0.0),
        random_bg=hparams.random_bg,
    )
    train = TrainConfig(
        batch_size=hparams.batch_size,
        max_steps=hparams.max_steps,
        lr=hparams.lr,
        distortion_loss_w=hparams.distortion_loss_w,
        ray_sampling_strategy=hparams.ray_sampling_strategy,
    )
    return cfg.replace(model=model, render=render, train=train)
