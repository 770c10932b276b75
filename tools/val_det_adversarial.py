"""Adversarial held-out detector validation (VERDICT.md round-4 weak #1).

The round-4 detector's 0.9876 mAP50 came from a val split drawn from the
SAME generator distribution it was trained on.  This tool builds a
held-out set from a *different* generator configuration — photographic
backgrounds, partial occlusions, extreme scales, plate-free negative
frames — and reports what the product actually runs on:

- mAP50 / mAP50-95 on the positive frames (101-pt AP, the repo's real
  val path: letterbox -> detector -> NMS);
- **false positives per frame at conf 0.7** on the plate-free negative
  frames — the ``cli/run.py`` operating point (reference
  ``inference/run.py:108-110``: imgsz 1280, d-conf 0.7);
- recall at conf 0.7 on the positives (the detections the pipeline would
  actually act on).

Numbers are persisted as machine-readable JSON (default ``EVAL_det.json``)
so tests can pin regression floors.

Usage:
  python tools/val_det_adversarial.py --weights checkpoints/plate_det640.npz \
      [--out EVAL_det.json] [--regen] [--n 300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np

# deliberately NOT the training configuration: different seed universe,
# occlusions on, harder negatives share, more plates
ADV = dict(seed=7770, neg_p=0.4, occlude_p=0.25, max_plates=4)


def build_set(out_dir: str, n: int, w: int, h: int):
    from make_detector_set import write_split

    # seed offset mirrors the make_detector_set CLI's val-split convention
    write_split(out_dir, "val", n, w, h, seed=ADV["seed"] + 10_000,
                max_plates=ADV["max_plates"], photo=True,
                neg_p=ADV["neg_p"], occlude_p=ADV["occlude_p"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="checkpoints/plate_det640.npz")
    p.add_argument("--arch", default="yolov5s")
    p.add_argument("--set-dir", default="/tmp/det_adversarial")
    p.add_argument("--n", type=int, default=300)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf-op", type=float, default=0.7,
                   help="the run.py operating confidence")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="EVAL_det.json")
    p.add_argument("--regen", action="store_true")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args(argv)

    img_dir = os.path.join(args.set_dir, "val", "images")
    if args.regen or not os.path.isdir(img_dir):
        build_set(args.set_dir, args.n, args.imgsz, args.imgsz)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from lpr_tpu.data.yolo_data import YoloValDataset
    from lpr_tpu.models.yolo import _SIZE_PRESETS, build_yolo, yolov5_spec
    from lpr_tpu.train.yolo import validate_map
    from lpr_tpu.weights.checkpoint import load_params

    size = args.arch.replace("yolov5", "") or "s"
    depth, width = _SIZE_PRESETS[size]
    model = build_yolo(yolov5_spec(nc=11, depth=depth, width=width),
                       strides=(8, 16, 32))
    params = load_params(args.weights, model.init(jax.random.PRNGKey(0)))

    lbl_dir = os.path.join(args.set_dir, "val", "labels")
    ds = YoloValDataset(img_dir, lbl_dir, imgsz=args.imgsz)

    # split positives / negatives by label content
    def has_labels(i):
        with open(os.path.join(
                lbl_dir, os.path.splitext(
                    os.path.basename(ds.paths[i]))[0] + ".txt")) as f:
            return bool(f.read().strip())

    pos_idx = [i for i in range(len(ds)) if has_labels(i)]
    neg_idx = [i for i in range(len(ds)) if i not in set(pos_idx)]
    print(f"adversarial set: {len(pos_idx)} positive / {len(neg_idx)} "
          f"negative frames")

    # --- mAP on positives (standard val path) ---
    ds_pos = YoloValDataset(img_dir, lbl_dir, imgsz=args.imgsz)
    ds_pos.paths = [ds.paths[i] for i in pos_idx]
    ds_pos.labels = [ds_pos.labels[i] for i in pos_idx]
    ds_pos.shapes = ds_pos.shapes[np.asarray(pos_idx)]
    t0 = time.perf_counter()
    metrics = validate_map(model, params,
                           ds_pos.batches(args.batch_size))
    vals = {k: float(np.mean(metrics[k]))
            for k in ("precision", "recall", "map50", "map")}
    print(f"positives mAP50 {vals['map50']:.4f}  mAP {vals['map']:.4f}  "
          f"({time.perf_counter() - t0:.0f}s)")

    # --- operating-point pass: detections at conf 0.7 ---
    from lpr_tpu.models.detector import Detector
    from PIL import Image

    det = Detector(model, params, [str(i) for i in range(11)],
                   size=(args.imgsz, args.imgsz), conf_thres=args.conf_op,
                   iou_thres=0.3, dtype=jnp.float32)

    def count_at_op(indices):
        """(frames, detections, hit-frames) at the operating conf."""
        n_det = 0
        hit_frames = 0
        for i in indices:
            frame = np.asarray(Image.open(ds.paths[i]).convert("RGB"))
            r = det.detect(frame)
            n_det += len(r)
            hit_frames += int(len(r) > 0)
        return len(indices), n_det, hit_frames

    nf, fp, fp_frames = count_at_op(neg_idx)
    print(f"negatives: {fp} false positives over {nf} plate-free frames "
          f"at conf {args.conf_op} ({fp / max(nf, 1):.3f} FP/frame; "
          f"{fp_frames} frames affected)")

    # recall at operating conf on positives: fraction of GT boxes matched
    # by any conf>=0.7 detection at IoU>=0.5
    def op_recall():
        matched = total = 0
        for i in pos_idx:
            frame = np.asarray(Image.open(ds.paths[i]).convert("RGB"))
            r = det.detect(frame)
            with open(os.path.join(
                    lbl_dir, os.path.splitext(
                        os.path.basename(ds.paths[i]))[0] + ".txt")) as f:
                rows = [list(map(float, l.split()))
                        for l in f.read().strip().splitlines()]
            H, W = frame.shape[:2]
            for cls, cx, cy, bw, bh in rows:
                total += 1
                gx1, gy1 = (cx - bw / 2) * W, (cy - bh / 2) * H
                gx2, gy2 = (cx + bw / 2) * W, (cy + bh / 2) * H
                for b in r.boxes:
                    ix1, iy1 = max(b[0], gx1), max(b[1], gy1)
                    ix2, iy2 = min(b[2], gx2), min(b[3], gy2)
                    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
                    union = ((b[2] - b[0]) * (b[3] - b[1])
                             + (gx2 - gx1) * (gy2 - gy1) - inter)
                    if union > 0 and inter / union >= 0.5:
                        matched += 1
                        break
        return matched, total

    m, t = op_recall()
    print(f"positives: recall@conf{args.conf_op} {m}/{t} = {m / max(t, 1):.3f}")

    result = {
        "weights": args.weights,
        "config": ADV | {"n": args.n, "imgsz": args.imgsz},
        "map50": vals["map50"], "map": vals["map"],
        "precision": vals["precision"], "recall": vals["recall"],
        "fitness": 0.1 * vals["map50"] + 0.9 * vals["map"],
        "op_conf": args.conf_op,
        "fp_per_negative_frame": fp / max(nf, 1),
        "negative_frames": nf,
        "op_recall": m / max(t, 1),
        "gt_boxes": t,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
