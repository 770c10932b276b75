"""Input-pipeline throughput: YoloDataset imgs/s with and without the RAM
image cache (reference --cache ram, yolov5/utils/datasets.py:484-507).

Writes a synthetic JPEG image tree (720p street frames with plates), then
measures epoch throughput of the full augmentation pipeline (mosaic4 +
copy_paste + random_perspective + HSV + flips + collate) cold vs cached.
The number to beat: a v5e training step at batch 16 / 640^2 runs ~10
steps/s, i.e. the loader must sustain >=160 imgs/s to keep the chip busy.

Usage: python tools/bench_input.py [--n 256] [--batch 16] [--epochs 3]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_tree(root: str, n: int, seed: int = 0):
    import random

    from PIL import Image

    from synth_plates import random_plate_text, render_frame_with_plates

    rng = random.Random(seed)
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    h, w = 720, 1280
    for i in range(n):
        plates = []
        lines = []
        for _ in range(rng.randint(1, 3)):
            pw = rng.randint(90, 220)
            ph = int(pw * rng.uniform(0.22, 0.35))
            x1 = rng.randint(0, w - pw - 1)
            y1 = rng.randint(0, h - ph - 1)
            plates.append((random_plate_text(rng), False,
                           (x1, y1, x1 + pw, y1 + ph)))
            lines.append(f"8 {(x1 + pw / 2) / w:.6f} {(y1 + ph / 2) / h:.6f} "
                         f"{pw / w:.6f} {ph / h:.6f}")
        frame = render_frame_with_plates((h, w), plates, rng)
        Image.fromarray(frame).save(os.path.join(img_dir, f"f{i:05d}.jpg"),
                                    quality=88)
        with open(os.path.join(lbl_dir, f"f{i:05d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return img_dir, lbl_dir


def epoch_rate(ds, batch, workers=0):
    n = 0
    t0 = time.perf_counter()
    for imgs, labels in ds.batches(batch, workers=workers):
        n += imgs.shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from lpr_tpu.data.yolo_data import YoloDataset

    with tempfile.TemporaryDirectory(prefix="lpr_input_bench_") as root:
        print(f"writing {args.n} synthetic 720p JPEGs...", file=sys.stderr)
        img_dir, lbl_dir = make_tree(root, args.n)
        hw = (args.imgsz, args.imgsz)

        cold = YoloDataset(img_dir, lbl_dir, hw, augment=True, seed=0)
        rates_cold = [epoch_rate(cold, args.batch)
                      for _ in range(args.epochs)]

        hot = YoloDataset(img_dir, lbl_dir, hw, augment=True, seed=0,
                          cache_images=True)
        t0 = time.perf_counter()
        gb = hot.cache_all()
        t_cache = time.perf_counter() - t0
        rates_hot = [epoch_rate(hot, args.batch)
                     for _ in range(args.epochs)]
        rates_par = [epoch_rate(hot, args.batch, workers=args.workers)
                     for _ in range(args.epochs)]

        print(json.dumps({
            "metric": "train_input_imgs_per_sec",
            "value": round(max(rates_par), 1),
            "unit": "imgs/s",
            "cached_sync_imgs_per_sec": round(max(rates_hot), 1),
            "uncached_imgs_per_sec": round(max(rates_cold), 1),
            "workers": args.workers,
            "cache_gb": round(gb, 2),
            "cache_build_s": round(t_cache, 1),
            "n_images": args.n,
            "imgsz": args.imgsz,
        }))


if __name__ == "__main__":
    main()
