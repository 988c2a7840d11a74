"""Materialize the procedural lego-proxy as an on-disk NSVF dataset.

Writes /tmp/Synthetic_NSVF/legoproxy (rgb PNGs + pose txts + intrinsics +
bbox) from the cached synthetic GT, so quality runs exercise the real disk
loader end-to-end:

    python scripts/export_lego_nsvf.py
    python train.py --root_dir /tmp/Synthetic_NSVF/legoproxy \
        --dataset_name nsvf --model_name pyramid ...

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/export_lego_nsvf.py [out_root]
"""

from __future__ import annotations

import sys
import time


def main():
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/Synthetic_NSVF/legoproxy"
    )
    from taichi_nerfs_tpu.data.nsvf_export import export_nsvf_dataset
    from taichi_nerfs_tpu.data.synthetic import SyntheticSphereDataset

    spec = "synthetic://lego?views=100&res=800"
    t0 = time.time()
    tr = SyntheticSphereDataset(root_dir=spec, split="train")
    te = SyntheticSphereDataset(root_dir=spec, split="test")
    print(f"GT ready ({time.time() - t0:.0f}s; cached after first run)")
    export_nsvf_dataset(out, {"train": tr, "test": te})
    print(f"wrote {len(tr)} train + {len(te)} test views to {out}")


if __name__ == "__main__":
    main()
