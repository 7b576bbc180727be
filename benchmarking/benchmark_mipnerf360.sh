#!/bin/bash
# mip-NeRF 360 benchmark (reference benchmarking/benchmark_mipnerf360.sh:
# downsample 0.25, per-scene scale, batch 4096)
export ROOT_DIR=${ROOT_DIR:-dataset/360_v2}
declare -A SCALES=( [garden]=16 [bicycle]=16 [stump]=16 [bonsai]=8 \
                    [counter]=8 [kitchen]=8 [room]=8 )
for SCENE in "${!SCALES[@]}"; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name colmap \
        --downsample 0.25 --scale ${SCALES[$SCENE]} --batch_size 4096 \
        --num_epochs 20 --lr 2e-2 --no_save_test
done
