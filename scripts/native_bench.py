"""Native-runner fps record (VERDICT r2 item 4).

Reference baseline: the Taichi AOT mobile demos render 300x600 at
13.5-22.4 fps on iPhone 14 / iPad Pro GPUs via Vulkan/Metal
(reference README.md:74-76, ViewController.mm:85-88, main.cpp:27-28).
This repo's deployment runner is portable C++17 on the CPU (the
TPU-native stack has no mobile-GPU kernel target), so the honest record
is ms/frame + fps per model family at the reference demo resolutions on
the stated host CPU.

Usage (writes docs-ready lines to stdout):
    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/native_bench.py \
        [--pyramid_ckpt results/model_pyramid.npz] [--frames 16]

Trains a small deployment-config hash-NGP on the procedural checker for
the NGP-family number (the reference's mobile artifact is its small
deployment config: 4 levels / 16-wide MLPs, train.py:88-100), exports
both families with utils/export.py, and drives
``native/build/tnerf_runner --bench``.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "native", "build", "tnerf_runner")

RESOLUTIONS = [(300, 600), (683, 512)]  # iPhone demo / iPad demo


def build_runner():
    if os.path.exists(RUNNER):
        return
    b = os.path.join(REPO, "native", "build")
    subprocess.run(
        ["cmake", "-S", os.path.join(REPO, "native"), "-B", b,
         "-DCMAKE_BUILD_TYPE=Release"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", b, "-j"], check=True, capture_output=True
    )


def run_bench(export_fn, family: str, frames: int):
    """``export_fn(img_wh) -> dir`` (resolution is baked into the export
    config — the runner has no resolution flags, like the reference's
    demos hardcode theirs, main.cpp:27-28)."""
    out = []
    for w, h in RESOLUTIONS:
        export_dir = export_fn((w, h))
        r = subprocess.run(
            [RUNNER, export_dir, os.path.join(export_dir, "out.ppm"),
             "--bench", str(frames)],
            capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            print(f"{family} {w}x{h}: runner failed: {r.stderr[-400:]}")
            continue
        m = re.search(
            r"bench \d+ frames: ([\d.]+) ms/frame \(([\d.]+) fps\)",
            r.stderr,
        )
        assert m, r.stderr[-400:]
        ms, fps = float(m.group(1)), float(m.group(2))
        out.append((w, h, ms, fps))
        print(f"{family} {w}x{h}: {ms:.1f} ms/frame ({fps:.2f} fps)",
              flush=True)
    return out


def bench_ngp(frames: int, steps: int):
    import numpy as np

    from taichi_nerfs_tpu.config import (
        Config,
        RenderConfig,
        TrainConfig,
        deployment_model_config,
    )
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.train.loop import Trainer
    from taichi_nerfs_tpu.utils.export import export_native

    scene = SyntheticSphereDataset(
        n_images=6, img_wh=(128, 128), variant="checker"
    )
    cfg = Config(
        model=deployment_model_config(0.5),
        render=RenderConfig(train_sample_cap=256),
        train=TrainConfig(batch_size=4096, max_steps=steps),
    )
    trainer = Trainer(
        cfg, scene.as_batch(), scene.K, scene.img_wh,
        log_fn=lambda *a, **k: None,
    )
    trainer.fit(steps, log_every=10**9)

    def export_at(img_wh):
        d = tempfile.mkdtemp(prefix="tnerf_native_ngp_")
        w, h = img_wh
        K = np.float32(
            [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]]
        )
        export_native(
            trainer.state.params, cfg.model,
            trainer.state.occupancy.bitfield,
            np.asarray(scene.poses), K, img_wh, d,
            render_cfg=cfg.render,
        )
        return d

    return run_bench(export_at, "ngp(deployment-config)", frames)


def bench_pyramid(ckpt: str, frames: int):
    import numpy as np

    from taichi_nerfs_tpu.models.pyramid import PyramidConfig
    from taichi_nerfs_tpu.utils.export import export_pyramid_native

    d = np.load(ckpt)
    levels = []
    i = 0
    while f"level_{i}" in d:
        levels.append(d[f"level_{i}"])
        i += 1
    params = {
        "levels": levels,
        "rgb_mlp": {
            k[len("rgb_mlp_"):]: d[k]
            for k in d.files
            if k.startswith("rgb_mlp_")
        },
    }
    feats = int(levels[0].shape[-1])
    lf = tuple(int(g.shape[-1]) for g in levels)
    cfg = PyramidConfig(
        resolutions=tuple(int(g.shape[0]) for g in levels),
        features=feats,
        deferred=True,
        level_features=lf if any(f != feats for f in lf) else (),
    )
    pose = np.concatenate(
        [np.diag([1.0, -1.0, -1.0]), [[0.0], [0.0], [1.6]]], axis=1
    ).astype(np.float32)

    def export_at(img_wh):
        w, h = img_wh
        out_dir = tempfile.mkdtemp(prefix="tnerf_native_pyr_")
        export_pyramid_native(
            params, cfg, pose,
            K=np.float32(
                [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]]
            ),
            img_wh=img_wh, out_dir=out_dir,
        )
        return out_dir

    return run_bench(export_at, f"pyramid(R={cfg.grid_res})", frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pyramid_ckpt", default="results/model_pyramid.npz")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--ngp_steps", type=int, default=400)
    args = ap.parse_args()
    build_runner()
    import multiprocessing

    print(f"host: {multiprocessing.cpu_count()} CPU core(s); reference "
          "baseline 13.5-22.4 fps on iPhone14/iPadPro mobile GPUs")
    bench_ngp(args.frames, args.ngp_steps)
    if os.path.exists(args.pyramid_ckpt):
        bench_pyramid(args.pyramid_ckpt, args.frames)
    else:
        print(f"pyramid ckpt {args.pyramid_ckpt} missing — skipped")


if __name__ == "__main__":
    sys.exit(main())
