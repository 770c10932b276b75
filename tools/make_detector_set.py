"""Materialize a synthetic street-scene detector dataset to disk.

Renders plate-bearing frames at arbitrary geometry (640x640 for training,
736x1280 rect for production-geometry validation — the reference plate
detector's serving shape, onnx_models/detection/config.pbtxt:8-10) with
YOLO-format labels, in the ``--img-dir``/``--label-dir`` layout consumed by
``lpr_tpu.cli.train_yolo``.  Scenes carry structured clutter (vehicle-ish
blocks, signage text distractors, lighting gradients, blur/noise) so the
detection task is non-trivial and val mAP is a meaningful number.

Classes follow the reference's 11-class map (detect_class_names.txt):
7 = square (two-row) license plate, 8 = rectangle (one-row) license plate.

Usage:
  python tools/make_detector_set.py --out .det640 --n 2000 --val-n 200
  python tools/make_detector_set.py --out .det_rect --n 0 --val-n 200 \
      --height 736 --width 1280
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw, ImageFont, ImageFilter

from tools.synth_plates import FONT, random_plate_text, render_plate


def _background(rng: random.Random, w: int, h: int) -> Image.Image:
    """Street-ish background: sky/road gradient + building & vehicle blocks
    + lane lines + signage distractor text."""
    base = np.zeros((h, w, 3), np.float32)
    sky = np.array([rng.uniform(90, 180)] * 3, np.float32) + rng.uniform(-20, 20)
    road = np.array([rng.uniform(40, 90)] * 3, np.float32)
    t = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None, None]
    base += (1 - t) * sky + t * road
    img = Image.fromarray(np.clip(base, 0, 255).astype(np.uint8))
    d = ImageDraw.Draw(img)
    # building / vehicle blocks
    for _ in range(rng.randint(6, 14)):
        bw = rng.randint(w // 10, w // 3)
        bh = rng.randint(h // 10, h // 3)
        x = rng.randint(-bw // 2, w - bw // 2)
        y = rng.randint(-bh // 2, h - bh // 2)
        c = tuple(rng.randint(25, 200) for _ in range(3))
        d.rectangle([x, y, x + bw, y + bh], fill=c,
                    outline=tuple(min(255, v + 30) for v in c))
    # lane-ish lines
    for _ in range(rng.randint(2, 6)):
        x0, x1 = rng.randint(0, w), rng.randint(0, w)
        d.line([x0, rng.randint(h // 2, h), x1, h], width=rng.randint(2, 6),
               fill=(rng.randint(150, 230),) * 3)
    # signage text distractors (plate-like glyphs in non-plate context)
    for _ in range(rng.randint(1, 4)):
        fs = rng.randint(max(h // 40, 8), max(h // 14, 10))
        try:
            font = ImageFont.truetype(FONT, fs)
        except OSError:
            font = ImageFont.load_default()
        txt = "".join(rng.choice("0123456789ABCDEFGHKLMNPRSTUVXYZ ")
                      for _ in range(rng.randint(3, 9)))
        d.text((rng.randint(0, max(w - 8 * fs, 1)),
                rng.randint(0, max(h - fs - 1, 1))), txt,
               fill=tuple(rng.randint(10, 240) for _ in range(3)), font=font)
    return img


def render_scene(rng: random.Random, w: int, h: int, max_plates: int = 3):
    """One frame + its labels: [(cls, cx, cy, bw, bh) normalized]."""
    img = _background(rng, w, h)
    labels = []
    boxes = []
    n = rng.randint(1, max_plates)
    scale_ref = min(w, h)
    for _ in range(n):
        two = rng.random() < 0.35
        text = random_plate_text(rng, two)
        if two:
            pw = rng.randint(int(scale_ref * 0.06), int(scale_ref * 0.22))
            ph = int(pw * rng.uniform(0.60, 0.80))
        else:
            pw = rng.randint(int(scale_ref * 0.08), int(scale_ref * 0.35))
            ph = int(pw * rng.uniform(0.22, 0.34))
        pw, ph = max(pw, 16), max(ph, 10)
        for _try in range(20):
            x1 = rng.randint(0, w - pw - 1)
            y1 = rng.randint(0, h - ph - 1)
            box = (x1, y1, x1 + pw, y1 + ph)
            if all(box[2] < b[0] or box[0] > b[2] or box[3] < b[1]
                   or box[1] > b[3] for b in boxes):
                break
        else:
            continue
        boxes.append(box)
        crop = render_plate(text, two, size=(pw, ph),
                            angle_deg=rng.uniform(-6, 6))
        # local illumination on the plate
        gain = rng.uniform(0.55, 1.1)
        crop = np.clip(crop.astype(np.float32) * gain, 0, 255).astype(np.uint8)
        img.paste(Image.fromarray(crop), (x1, y1))
        cls = 7.0 if two else 8.0
        labels.append((cls, (x1 + pw / 2) / w, (y1 + ph / 2) / h,
                       pw / w, ph / h))
    # global photometric: blur + sensor noise + exposure
    if rng.random() < 0.7:
        img = img.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.4)))
    arr = np.asarray(img, np.float32)
    arr = arr * rng.uniform(0.8, 1.15) + rng.uniform(-15, 15)
    arr += np.random.RandomState(rng.randint(0, 1 << 30)).normal(
        0, rng.uniform(1.0, 7.0), arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8), labels


def write_split(out: str, split: str, n: int, w: int, h: int,
                seed: int, max_plates: int) -> None:
    img_dir = os.path.join(out, split, "images")
    lbl_dir = os.path.join(out, split, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    rng = random.Random(seed)
    for i in range(n):
        frame, labels = render_scene(rng, w, h, max_plates)
        stem = f"{split}_{i:05d}"
        Image.fromarray(frame).save(os.path.join(img_dir, stem + ".jpg"),
                                    quality=90)
        with open(os.path.join(lbl_dir, stem + ".txt"), "w") as f:
            for cls, cx, cy, bw, bh in labels:
                f.write(f"{int(cls)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
    print(f"{split}: {n} frames at {w}x{h} -> {img_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--val-n", type=int, default=200)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-plates", type=int, default=3)
    args = ap.parse_args()
    if args.n:
        write_split(args.out, "train", args.n, args.width, args.height,
                    args.seed, args.max_plates)
    if args.val_n:
        write_split(args.out, "val", args.val_n, args.width, args.height,
                    args.seed + 10_000, args.max_plates)


if __name__ == "__main__":
    main()
