#!/bin/bash
# RTMV benchmark (reference benchmarking/benchmark_rtmv.sh)
export ROOT_DIR=${ROOT_DIR:-dataset/RTMV}
for ENV in bricks google_scanned_objects abc amazon_berkeley; do
  for SCENE_DIR in $ROOT_DIR/$ENV/*/; do
    SCENE=$(basename $SCENE_DIR)
    python train.py \
        --root_dir $SCENE_DIR \
        --exp_name $ENV/$SCENE --dataset_name rtmv \
        --num_epochs 20 --batch_size 16384 --lr 2e-2 \
        --no_save_test
  done
done
