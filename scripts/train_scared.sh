#!/bin/sh
# Mirror of reference scripts/train_scared.sh (same operating point).
# Like the reference (scripts/train_scared.sh:10), training resumes from the
# pretrained ucnerf.tar by default when present; set CKPT= to start from
# scratch or point elsewhere.
CKPT="${CKPT-pretrained_weights/ucnerf.tar}"
if [ -n "$CKPT" ] && [ -f "$CKPT" ]; then
    set -- --ckpt "$CKPT" "$@"
elif [ -n "$CKPT" ]; then
    echo "note: $CKPT not found, training from scratch" >&2
fi
python train.py --preset train_scared \
    --datadir "${DATADIR:-../../Datasets/scared}" \
    --expname scared --basedir ./logs "$@"
