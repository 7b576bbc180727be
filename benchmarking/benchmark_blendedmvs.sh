#!/bin/bash
# BlendedMVS benchmark (reference benchmarking/benchmark_blendedmvs.sh)
export ROOT_DIR=${ROOT_DIR:-dataset/BlendedMVS}
for SCENE in Jade Fountain Character Statues; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name nsvf \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --no_save_test
done
