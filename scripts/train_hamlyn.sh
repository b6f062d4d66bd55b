#!/bin/sh
# Mirror of reference scripts/train_hamlyn.sh (patch_size 4)
python train.py --preset train_hamlyn \
    --datadir "${DATADIR:-../../Datasets/hamlyn}" \
    --expname hamlyn --basedir ./logs "$@"
