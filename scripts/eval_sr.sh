#!/usr/bin/env bash
# Protocol evaluation (reference scripts/eval_sr.sh): raw-OCR vs SR->OCR
# full-plate accuracy + CER over a labeled folder (filename stem = GT).
# Note the reference script ran --ocr-conf 0.45 while its README table
# says 0.5 (SURVEY.md section 6) — default here follows the README.
set -euo pipefail
if [ -z "${SR_WEIGHTS:-}" ] || [ -z "${OCR_WEIGHTS:-}" ]; then
    echo "usage: SR_WEIGHTS=<lpsr .pth/.npz> OCR_WEIGHTS=<char-detector .pt/.npz> \\" >&2
    echo "       [EVAL_FOLDER=dir] [OCR_CONF=0.5] $0 [extra evaluate args]" >&2
    exit 2
fi
EVAL_FOLDER=${EVAL_FOLDER:-.eval_set}
python -m lpr_tpu.cli.evaluate \
    --sr-weights "$SR_WEIGHTS" \
    --ocr-weights "$OCR_WEIGHTS" \
    --eval-folder "$EVAL_FOLDER" \
    --ocr-conf "${OCR_CONF:-0.5}" \
    --iou 0.3 \
    "$@"
