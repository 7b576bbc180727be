#!/bin/bash
# Synthetic-NSVF benchmark (reference benchmarking/benchmark_synthetic_nsvf.sh)
export ROOT_DIR=${ROOT_DIR:-dataset/Synthetic_NSVF}
for SCENE in Wineholder Steamtrain Toad Robot Bike Palace Spaceship Lifestyle; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name nsvf \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 --eval_lpips \
        --no_save_test
done
