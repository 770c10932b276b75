"""Mine additional real plate crops from the reference's report images.

Sources (all REAL captures, ground truth read from the reference's own
annotations in the figures):

- ``/root/reference/imgs/image.png`` — the README pipeline demo frame: two
  detected two-row plates with Original (LR) and Super-Resolved crops and
  the reference's OCR/SR-OCR strings (51G18593, 51A02352).  The Original
  crops are true low-resolution captures; they are converted two-row -> long
  (top|bottom hconcat, the reference's format_long_plate,
  inference/run.py:21-52) so they enter the standard 192x32 eval protocol.
- ``/root/reference/imgs/realsr.png`` — three real HR captures in long
  format with readable ground truth (11A05826, 12A08027, 12A10087); the
  fourth row's digits are ambiguous (104.93 vs 184.93) and is excluded.

Output: ``tests/fixtures/real_plates2/{GT}.png`` (eval inputs, long format)
plus ``sr/{GT}.png`` for the reference-SR versions where the figure carries
them.  Filename-stem ground truth per the eval protocol
(evaluation/eval.py:23-25).

Usage: python tools/mine_report_plates.py
"""

import os

import numpy as np
from PIL import Image

REF = "/root/reference/imgs"


def two_row_to_long(crop: np.ndarray) -> np.ndarray:
    """Split a two-row plate crop at the vertical midline and hconcat
    (reference format_long_plate, inference/run.py:21-52)."""
    h = crop.shape[0] // 2
    top, bottom = crop[:h], crop[h : 2 * h]
    return np.concatenate([top, bottom], axis=1)


def main():
    out = "tests/fixtures/real_plates2"
    os.makedirs(out, exist_ok=True)
    os.makedirs(os.path.join(out, "sr"), exist_ok=True)

    # --- imgs/image.png: LR originals + reference SR, two-row -> long ---
    demo = np.asarray(Image.open(f"{REF}/image.png").convert("RGB"))
    # (gt, original_box, sr_box) in (y1, y2, x1, x2) page coordinates
    plates = [
        ("51G18593", (594, 685, 210, 310), (724, 810, 210, 310)),
        ("51A02352", (585, 685, 629, 771), (715, 815, 629, 771)),
    ]
    for gt, (oy1, oy2, ox1, ox2), (sy1, sy2, sx1, sx2) in plates:
        orig = two_row_to_long(demo[oy1:oy2, ox1:ox2])
        sr = two_row_to_long(demo[sy1:sy2, sx1:sx2])
        Image.fromarray(orig).save(os.path.join(out, gt + ".png"))
        Image.fromarray(sr).save(os.path.join(out, "sr", gt + ".png"))
        print(f"{gt}: LR {orig.shape[1]}x{orig.shape[0]} + reference SR")

    # --- imgs/realsr.png: real HR captures, already long format ---
    realsr = np.asarray(Image.open(f"{REF}/realsr.png").convert("RGB"))
    hr_plates = [
        ("11A05826", (72, 108, 45, 327)),
        ("12A08027", (141, 177, 45, 327)),
        ("12A10087", (222, 258, 45, 327)),
    ]
    for gt, (y1, y2, x1, x2) in hr_plates:
        crop = realsr[y1:y2, x1:x2]
        Image.fromarray(crop).save(os.path.join(out, gt + ".png"))
        print(f"{gt}: HR {crop.shape[1]}x{crop.shape[0]}")
    print(f"wrote {len(plates) + len(hr_plates)} real plates -> {out}")


if __name__ == "__main__":
    main()
