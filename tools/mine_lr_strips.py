"""Mine the real low-resolution plate strips from the reference's
kernel-estimation figure.

``/root/reference/imgs/kere.png`` ("Real LR -> Kernel Estimation -> Kernel
Pool") shows four REAL low-resolution captures — the actual real-LR domain
the reference's CycleGAN LR-generator was trained to imitate
(``train/cyclegans.py:24-141``): a blue-cast night plate, a dark
underexposed plate, a washed gray plate (86-F8 4229) and a saturated
yellow plate (16-87 1636).  They are unpaired style exemplars (no OCR
ground truth needed): the round-5 CycleGAN real-LR run points domain B at
these plus the mined VN report crops.

The same figure's plates also appear in ``imgs/cycle.png``'s "Real LR"
panel (overlapping collage, no new plates), so this file is the canonical
source.

Output: ``tests/fixtures/real_lr_strips/kere_{i}.png``.

Usage: python tools/mine_lr_strips.py
"""

import os

import numpy as np
from PIL import Image

REF = "/root/reference/imgs/kere.png"
OUT = "tests/fixtures/real_lr_strips"

# (y0, y1, x0, x1) strip boxes located by row/col variance profiling
STRIPS = [
    (79, 115, 72, 437),
    (145, 182, 72, 437),
    (220, 256, 72, 437),
    (290, 327, 72, 437),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    img = np.asarray(Image.open(REF).convert("RGB"))
    for i, (y0, y1, x0, x1) in enumerate(STRIPS):
        strip = img[y0:y1, x0:x1]
        Image.fromarray(strip).save(os.path.join(OUT, f"kere_{i}.png"))
        print(f"kere_{i}: {strip.shape[1]}x{strip.shape[0]}")
    print(f"wrote {len(STRIPS)} real LR strips -> {OUT}")


if __name__ == "__main__":
    main()
