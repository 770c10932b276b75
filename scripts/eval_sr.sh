#!/usr/bin/env bash
# Protocol evaluation (reference scripts/eval_sr.sh): raw-OCR vs SR->OCR
# full-plate accuracy + CER over a labeled folder (filename stem = GT).
# Note the reference script ran --ocr-conf 0.45 while its README table
# says 0.5 (SURVEY.md section 6) — default here follows the README.
set -euo pipefail
EVAL_FOLDER=${EVAL_FOLDER:-.eval_set}
python -m lpr_tpu.cli.evaluate \
    --sr-weights "${SR_WEIGHTS:-/root/reference/weights/best_model.pth}" \
    --ocr-weights "${OCR_WEIGHTS:-/root/reference/weights/char.pt}" \
    --eval-folder "$EVAL_FOLDER" \
    --ocr-conf "${OCR_CONF:-0.5}" \
    --iou 0.3 \
    "$@"
