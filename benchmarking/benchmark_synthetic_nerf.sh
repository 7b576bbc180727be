#!/bin/bash
# Synthetic-NeRF benchmark (reference benchmarking/benchmark_synthetic_nerf.sh:
# 20 epochs x 16384 rays, lr 2e-2, per-scene)
export ROOT_DIR=${ROOT_DIR:-dataset/Synthetic_NeRF}
for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name nerf \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --eval_lpips \
        --no_save_test
done
