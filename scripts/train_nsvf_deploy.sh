#!/bin/bash
# Deployment-config training + export (reference: scripts/train_nsvf_deploy.sh).
export DATA_DIR=${DATA_DIR:-./Synthetic_NeRF}

python train.py \
    --root_dir "$DATA_DIR/Lego" \
    --exp_name Lego_deploy \
    --dataset_name nsvf \
    --batch_size 8192 \
    --lr 1e-2 \
    --max_steps 20000 \
    --deployment \
    --deployment_model_path ./deploy \
    "$@"
