#!/bin/bash
# instant-ngp transforms.json dataset (reference: scripts/train_ngp_dataset.sh).
export DATA_DIR=${DATA_DIR:-./data/ngp}

python train.py \
    --root_dir "$DATA_DIR" \
    --exp_name ngp_scene \
    --dataset_name ngp \
    --scale 8.0 \
    --downsample 0.5 \
    "$@"
