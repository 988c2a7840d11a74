#!/bin/bash
# Video -> COLMAP -> train pipeline (reference: scripts/train_from_video.sh).
# usage: train_from_video.sh <video> <workdir>
set -e
VIDEO=${1:?usage: train_from_video.sh <video> <workdir>}
WORK=${2:?usage: train_from_video.sh <video> <workdir>}

python -m taichi_nerfs_tpu.data.colmap2nerf \
    --video "$VIDEO" \
    --out_dir "$WORK" \
    --video_fps 2

python train.py \
    --root_dir "$WORK" \
    --exp_name video_scene \
    --dataset_name ngp \
    --scale 8.0 \
    --gui
