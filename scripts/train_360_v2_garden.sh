#!/bin/bash
# Unbounded mip-NeRF-360 garden scene (reference: scripts/train_360_v2_garden.sh).
export DATA_DIR=${DATA_DIR:-./360_v2}

python train.py \
    --root_dir "$DATA_DIR/garden" \
    --exp_name garden \
    --dataset_name colmap \
    --scale 8.0 \
    --downsample 0.25 \
    --batch_size 4096 \
    "$@"
