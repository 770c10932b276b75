#!/usr/bin/env bash
# Chunked detector training — the OOM-safe driver for long runs on the
# axon TPU tunnel.
#
# The experimental axon plugin leaks host-side buffers for donated device
# arrays: with yolov5s's ~78 MB of donated optimizer state per step, a
# 640^2/batch-16 run leaks ~19 GB of RSS per 188-step epoch and a 128 GB
# box OOMs after ~6 epochs (observed: oom-kill at 130 GB, round 5).  Until
# the plugin frees donated buffers, long trainings must run as short
# chunks in fresh processes, resuming from last.npz — the cosine schedule
# becomes warm restarts with a per-chunk peak LR, which is a reasonable
# fine-tune schedule in its own right.
#
# Usage:
#   scripts/train_det_chunked.sh DATA_DIR CKPT_DIR INIT_WEIGHTS \
#       "LR0 LR1 LR2 ..." [EPOCHS_PER_CHUNK] [SNAPSHOT_DIR]
set -eu
cd "$(dirname "$0")/.."

DATA=$1
CKPT=$2
INIT=$3
LRS=($4)
EPC=${5:-5}
SNAP=${6:-$CKPT/chunks}
mkdir -p "$SNAP"

i=0
for lr in "${LRS[@]}"; do
  echo "=== chunk $i (lr $lr, $EPC epochs) ==="
  timeout 7200 python -m lpr_tpu.cli.train_yolo \
    --img-dir "$DATA/train/images" --label-dir "$DATA/train/labels" \
    --val-img-dir "$DATA/val/images" --val-label-dir "$DATA/val/labels" \
    --arch yolov5s --nc 11 --imgsz 640 --batch-size 16 --epochs "$EPC" \
    --lr0 "$lr" --init-weights "$INIT" --cache \
    --ckpt-dir "$CKPT" --run-project det-chunked --patience 100 \
    2>&1 | grep -v WARNING | tail -$((EPC + 3))
  cp "$CKPT/best.npz" "$SNAP/best_$i.npz" 2>/dev/null || true
  cp "$CKPT/last.npz" "$SNAP/last_$i.npz" 2>/dev/null || true
  INIT="$CKPT/last.npz"
  i=$((i + 1))
done
echo "CHUNKS_DONE ($i chunks -> $SNAP)"
