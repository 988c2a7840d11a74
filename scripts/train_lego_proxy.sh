#!/bin/bash
# Lego-proxy quality record (VERDICT r1 item 2): train the dense-pyramid
# flagship on the procedural mesh-style lego build (100 views, 800^2,
# sphere-traced surface GT — data/synthetic.py `lego`) and evaluate on
# the 25-view held-out rig.  Reference bar: Synthetic-NeRF Lego 35.0 PSNR
# in 208 s on an RTX 3090 (reference README.md:33-37).
#
# The dataset is generated on first use and cached under
# /tmp/tnerf_gt_cache (~2 min on the TPU).
export PYTHONPATH="/root/repo:${PYTHONPATH}"
python train.py \
    --root_dir "synthetic://lego?views=100&res=800" \
    --dataset_name synthetic \
    --model_name pyramid \
    --max_steps "${MAX_STEPS:-3600}" \
    --exp_name lego_proxy "$@"
