#!/bin/bash
# Synthetic-NeRF benchmark (reference benchmarking/benchmark_synthetic_nerf.sh:
# 20 epochs x 16384 rays, lr 2e-2, per-scene). Defaults reproduce the
# reference schedule verbatim; the env overrides exist so the same script
# can be driven unattended on a synthesized fixture in CI
# (tests/test_benchmark_readiness.py) — a real dataset run is then a
# zero-code event: ROOT_DIR=/path/to/Synthetic_NeRF ./benchmark_synthetic_nerf.sh
export ROOT_DIR=${ROOT_DIR:-dataset/Synthetic_NeRF}
SCENES=${SCENES:-"Chair Drums Ficus Hotdog Lego Materials Mic Ship"}
EPOCHS=${EPOCHS:-20}
BATCH_SIZE=${BATCH_SIZE:-16384}
LR=${LR:-2e-2}
for SCENE in $SCENES; do
    python train.py \
        --root_dir $ROOT_DIR/$SCENE \
        --exp_name $SCENE --dataset_name nerf \
        --num_epochs $EPOCHS --batch_size $BATCH_SIZE --lr $LR --eval_lpips \
        --no_save_test $EXTRA_ARGS
done
