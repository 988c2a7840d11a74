"""Training driver — public CLI preserved from the reference (train.py:35-325).

``python train.py --root_dir <data> --dataset_name nsvf ...`` trains the
flagship NGP model, saves a full checkpoint to ``results/model.npz``, runs
the evaluation loop (per-image PSNR/SSIM + first-view rgb/depth PNGs), and
optionally exports deployment weights / opens the interactive viewer.
"""

from __future__ import annotations

import os
import time

import numpy as np

from opt import config_from_opts, get_opts


def main():
    hparams = get_opts()
    cfg = config_from_opts(hparams)

    val_dir = "results/"

    from taichi_nerfs_tpu.data import dataset_dict
    from taichi_nerfs_tpu.train import Trainer, create_train_state
    from taichi_nerfs_tpu.train.eval import evaluate
    from taichi_nerfs_tpu.utils import (
        load_checkpoint,
        save_checkpoint,
        save_deployment_model,
    )

    dataset_cls = dataset_dict[hparams.dataset_name]
    train_dataset = dataset_cls(
        root_dir=hparams.root_dir,
        split=hparams.split,
        downsample=hparams.downsample,
    )
    test_dataset = dataset_cls(
        root_dir=hparams.root_dir,
        split="test",
        downsample=hparams.downsample,
    )

    state = create_train_state(cfg)
    start_step = 0
    if hparams.ckpt_path:
        state, start_step = load_checkpoint(hparams.ckpt_path, state)
        print(f"Load checkpoint from {hparams.ckpt_path} (step {start_step})")

    trainer = Trainer(
        cfg,
        train_dataset.as_batch(),
        train_dataset.K,
        train_dataset.img_wh,
        state=state,
    )
    trainer.step = start_step

    if not hparams.val_only:
        tic = time.time()
        trainer.fit(hparams.max_steps)
        print(f"training done in {time.time() - tic:.1f}s")

    if hparams.deployment:
        save_deployment_model(
            trainer.state.params,
            cfg.model,
            trainer.state.occupancy.bitfield,
            np.asarray(train_dataset.poses),
            hparams.deployment_model_path,
        )

    os.makedirs(val_dir, exist_ok=True)
    save_checkpoint(
        os.path.join(val_dir, "model.npz"), trainer.state, trainer.step
    )

    evaluate(
        trainer.state.params,
        cfg,
        trainer.state.occupancy.bitfield,
        test_dataset,
        save_dir=val_dir,
    )

    if hparams.gui:
        from taichi_nerfs_tpu.viewer.gui import NGPGUI

        NGPGUI(
            cfg,
            trainer.state.params,
            trainer.state.occupancy.bitfield,
            test_dataset.K,
            test_dataset.img_wh,
            np.asarray(test_dataset.poses),
        ).render()


if __name__ == "__main__":
    main()
