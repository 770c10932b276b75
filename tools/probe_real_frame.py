"""Probe a plate detector on the real demo frame (sim-to-real check).

Runs a detector checkpoint over ``tests/fixtures/real_frames/demo_frame.png``
at the production detection size and reports, for a sweep of confidence
thresholds, which detections land on the two ground-truth plates (IoU vs
``demo_frame.json``).  This is the measurement behind the round-5
"does the synthetic-only detector see a real photograph" question
(reference demo: ``inference/run.py:118-280`` at conf 0.7).

Usage:
  python tools/probe_real_frame.py --weights checkpoints/plate_det640.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def iou_xyxy(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="checkpoints/plate_det640.npz")
    ap.add_argument("--frame", default="tests/fixtures/real_frames/demo_frame.png")
    ap.add_argument("--gt", default="tests/fixtures/real_frames/demo_frame.json")
    ap.add_argument("--imgsz", type=int, default=1280)
    ap.add_argument("--conf", type=float, default=0.05)
    ap.add_argument("--arch", default="yolov5s")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from lpr_tpu.models.detector import Detector
    from lpr_tpu.models.yolo import _SIZE_PRESETS, build_yolo, yolov5_spec
    from lpr_tpu.weights.checkpoint import load_params

    frame = np.asarray(Image.open(args.frame).convert("RGB"))
    with open(args.gt) as f:
        gt = json.load(f)

    depth, width = _SIZE_PRESETS[args.arch.replace("yolov5", "") or "s"]
    model = build_yolo(yolov5_spec(nc=11, depth=depth, width=width),
                       strides=(8, 16, 32))
    params = model.init(jax.random.PRNGKey(0))
    params = load_params(args.weights, params)
    names = [str(i) for i in range(11)]
    det = Detector(model, params, names, size=(args.imgsz, args.imgsz),
                   conf_thres=args.conf, iou_thres=0.3, dtype=np.float32)
    r = det.detect(frame)
    print(f"{len(r)} detections at conf>={args.conf}")
    order = np.argsort(-r.scores)
    for i in order[:25]:
        b = r.boxes[i]
        hits = [(p["text"], round(iou_xyxy(b, p["box_xyxy"]), 3))
                for p in gt["plates"] if iou_xyxy(b, p["box_xyxy"]) > 0.1]
        print(f"  conf {r.scores[i]:.3f} cls {int(r.classes[i])} "
              f"box {[round(float(v), 1) for v in b]} {hits or ''}")
    for p in gt["plates"]:
        best = max((iou_xyxy(r.boxes[i], p["box_xyxy"]), float(r.scores[i]))
                   for i in range(len(r))) if len(r) else (0.0, 0.0)
        print(f"GT {p['text']}: best IoU {best[0]:.3f} at conf {best[1]:.3f}")


if __name__ == "__main__":
    main()
