#!/bin/bash
# NeRF++ (tanks and temples) benchmark (reference benchmarking/benchmark_nerfpp.sh)
export ROOT_DIR=${ROOT_DIR:-dataset/tat}
for SCENE in tat_intermediate_M60 tat_intermediate_Playground \
             tat_intermediate_Train tat_training_Truck; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name nerfpp \
        --scale 4 --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --no_save_test
done
