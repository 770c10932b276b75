#!/usr/bin/env bash
# CycleGAN degradation-GAN training (reference scripts/train_cycle.sh):
# identity x5, LSGAN x2, cycle 10/20, ImagePool(50), D losses x0.5.
set -euo pipefail
python -m lpr_tpu.cli.train_cyclegan \
    --dataroot "${DATAROOT:-.cycle_data}" \
    --epochs "${EPOCHS:-100}" \
    --batch-size 1 \
    --lr 1e-4 \
    --width 192 --height 32 \
    --ckpt-dir "${CKPT_DIR:-checkpoints/cyclegan}" \
    "$@"
