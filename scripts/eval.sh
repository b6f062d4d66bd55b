#!/bin/sh
# Mirror of reference scripts/eval.sh (pretrained weights, SCARED val split)
python train.py --preset eval_scared \
    --datadir "${DATADIR:-../../Datasets/scared}" \
    --ckpt "${CKPT:-pretrained_weights/ucnerf.tar}" \
    --expname scared --basedir ./logs "$@"
