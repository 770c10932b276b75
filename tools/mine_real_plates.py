"""Mine real HR/LR plate-crop pairs from the reference experiment figures.

``/root/reference/experiments/ver0{1,2,3}/test_results.png`` are 5x3 panel
grids (HR | LR | SR) of REAL captured plates — the only real-capture data the
reference ships beyond its report image.  All three versions show the SAME
five plates (the SR column differs per model version), so the unique mineable
set is 5 pairs.  This tool auto-detects the panels by connected-component
analysis on the white page background, crops the HR and LR columns, and
writes them with ground-truth filenames (``cli/evaluate.py``'s filename-GT
protocol):

- ``tests/fixtures/real_plates_cn/{TEXT}.png``      — the LR crop (eval input)
- ``tests/fixtures/real_plates_cn/hr/{TEXT}.png``   — the HR crop (for reference)

Ground truth (read from the HR panels; Latin-readable portion of the Chinese
plates, province glyph excluded — the reference OCR charset is digits+Latin):
A90G21, A110R6, B319BB, A002J5, A00E34.

Usage: python tools/mine_real_plates.py [--src .../ver03/test_results.png]
"""

import argparse
import os

import numpy as np
from PIL import Image

GT = ["A90G21", "A110R6", "B319BB", "A002J5", "A00E34"]


def find_panels(img: np.ndarray, min_area: int = 100_000):
    """Bounding boxes of the photo panels on the white page."""
    from scipy import ndimage

    gray = img.mean(axis=2)
    mask = gray < 245  # non-white
    lab, n = ndimage.label(mask)
    boxes = []
    for sl in ndimage.find_objects(lab):
        h = sl[0].stop - sl[0].start
        w = sl[1].stop - sl[1].start
        if h * w >= min_area and w > 2 * h:  # plate panels are wide
            boxes.append((sl[0].start, sl[1].start, sl[0].stop, sl[1].stop))
    # sort into grid order: rows by y, then columns by x
    boxes.sort(key=lambda b: (b[0], b[1]))
    rows = []
    for b in boxes:
        if rows and abs(rows[-1][0][0] - b[0]) < 200:
            rows[-1].append(b)
        else:
            rows.append([b])
    return [sorted(r, key=lambda b: b[1]) for r in rows]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src",
                   default="/root/reference/experiments/ver03/test_results.png")
    p.add_argument("--out", default="tests/fixtures/real_plates_cn")
    args = p.parse_args(argv)

    img = np.asarray(Image.open(args.src).convert("RGB"))
    rows = find_panels(img)
    assert len(rows) == len(GT), f"expected {len(GT)} rows, got {len(rows)}"
    os.makedirs(os.path.join(args.out, "hr"), exist_ok=True)
    for gt, row in zip(GT, rows):
        assert len(row) >= 2, f"row for {gt}: {len(row)} panels"
        (hy0, hx0, hy1, hx1), (ly0, lx0, ly1, lx1) = row[0], row[1]
        Image.fromarray(img[hy0:hy1, hx0:hx1]).save(
            os.path.join(args.out, "hr", f"{gt}.png"))
        Image.fromarray(img[ly0:ly1, lx0:lx1]).save(
            os.path.join(args.out, f"{gt}.png"))
        print(f"{gt}: HR {hx1-hx0}x{hy1-hy0}  LR {lx1-lx0}x{ly1-ly0}")
    print(f"wrote {len(GT)} LR crops to {args.out}")


if __name__ == "__main__":
    main()
