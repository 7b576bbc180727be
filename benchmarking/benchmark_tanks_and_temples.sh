#!/bin/bash
# TanksAndTemples benchmark (reference benchmarking/benchmark_tanks_and_temples.sh)
export ROOT_DIR=${ROOT_DIR:-dataset/TanksAndTemple}
for SCENE in Ignatius Truck Barn Caterpillar Family; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name nsvf \
        --downsample 0.5 --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --no_save_test
done
