"""Publish the current quality record into the tracked docs/records/.

Copies the manifest written by scripts/quality_run.py (config hash,
per-view PSNRs, seed, git commit) and renders the first held-out view
(rgb + depth PNG) from the recorded checkpoint, so every number in the
README/docs points at an in-repo artifact (round-3 verdict item 7; the
full .npz checkpoint stays untracked — reproduce with the manifest's
argv at its git_commit).

Usage:
    PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/publish_record.py \
        [--state /tmp/q_eN.pkl] [--name lego_proxy]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest",
                    default="results/model_pyramid.manifest.json")
    ap.add_argument("--name", default="lego_proxy")
    ap.add_argument("--state", default="")
    args = ap.parse_args()

    out = os.path.join("docs", "records")
    os.makedirs(out, exist_ok=True)
    with open(args.manifest) as f:
        man = json.load(f)
    shutil.copy(args.manifest,
                os.path.join(out, f"{args.name}.manifest.json"))
    print(f"published manifest: psnr={man['eval_psnr']} "
          f"ssim={man['eval_ssim']} wall={man['train_wall_s']}s "
          f"views_finite={man['views_finite']}")

    if not args.state:
        return
    import numpy as np

    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset
    from taichi_nerfs_tpu.models.pyramid import PyramidConfig
    from taichi_nerfs_tpu.train.swr_step import (
        SwrTrainConfig,
        SwrTrainer,
        SwrTrainState,
    )
    from taichi_nerfs_tpu.utils.viz import depth2img

    cfg_blob = json.loads(man["config"])
    # configs are plain JSON dicts (quality_run.py) — reconstruct via
    # the dataclass constructors; NEVER eval manifest content (a
    # manifest is untrusted input)
    if isinstance(cfg_blob["mcfg"], str):
        raise SystemExit(
            "legacy repr-format manifest: re-generate it with "
            "scripts/quality_run.py (eval of manifest strings was "
            "removed for safety)"
        )

    def _tup(d):
        return {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in d.items()
        }

    mcfg = PyramidConfig(**_tup(cfg_blob["mcfg"]))
    tcfg = SwrTrainConfig(**_tup(cfg_blob["tcfg"]))
    spec = cfg_blob["spec"]
    train_ds = SyntheticSphereDataset(spec, split="train")
    tr = SwrTrainer(
        mcfg, tcfg, train_ds.rays, train_ds.poses, train_ds.K,
        train_ds.img_wh,
        alphas=train_ds.alphas if (tcfg.random_bg or tcfg.alpha_w > 0)
        else None,
    )
    tr.load_state(args.state)
    tr.state = SwrTrainState(tr.state.params, (), tr.state.rng)
    test_ds = SyntheticSphereDataset(spec, split="test")
    w, h = test_ds.img_wh
    s0 = test_ds[0]
    o = tr.render(s0["pose"], K=None, img_wh=(w, h), lat_cap=None)
    rgb = np.clip(np.asarray(o["rgb"]).reshape(h, w, 3), 0, 1)
    gt = np.clip(np.asarray(s0["rgb"]).reshape(h, w, 3), 0, 1)
    depth = np.asarray(o["depth"]).reshape(h, w)
    import imageio.v2 as iio

    iio.imwrite(os.path.join(out, f"{args.name}_rgb.png"),
                (rgb * 255).astype(np.uint8))
    iio.imwrite(os.path.join(out, f"{args.name}_gt.png"),
                (gt * 255).astype(np.uint8))
    iio.imwrite(os.path.join(out, f"{args.name}_depth.png"),
                depth2img(depth))
    psnr = -10 * np.log10(((rgb - gt) ** 2).mean())
    print(f"published view 0 renders (psnr {psnr:.2f})")


if __name__ == "__main__":
    main()
