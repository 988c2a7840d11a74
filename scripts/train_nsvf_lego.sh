#!/bin/bash
# Canonical Lego run (reference: scripts/train_nsvf_lego.sh).
export DATA_DIR=${DATA_DIR:-./Synthetic_NeRF}

python train.py \
    --root_dir "$DATA_DIR/Lego" \
    --exp_name Lego \
    --dataset_name nsvf \
    --batch_size 8192 \
    --lr 1e-2 \
    "$@"
