#!/usr/bin/env bash
# LPSR training (reference scripts/train_sr.sh): MSE/Adam/plateau-on-PSNR,
# best+last checkpoints. Same batch/lr as the reference script.
set -euo pipefail
DATA=${DATA:-.lpsr_data}
python -m lpr_tpu.cli.train_lpsr \
    --hr-train-dir "$DATA/train/hr" \
    --lr-train-dir "$DATA/train/lr" \
    --hr-val-dir "$DATA/test/hr" \
    --lr-val-dir "$DATA/test/lr" \
    --ckpt-dir "${CKPT_DIR:-checkpoints/lpsr}" \
    --epochs "${EPOCHS:-100}" \
    --batch-size 16 \
    --lr 1e-4 \
    --width 192 --height 32 \
    "$@"
