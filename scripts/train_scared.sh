#!/bin/sh
# Mirror of reference scripts/train_scared.sh (same operating point)
python train.py --preset train_scared \
    --datadir "${DATADIR:-../../Datasets/scared}" \
    --expname scared --basedir ./logs "$@"
