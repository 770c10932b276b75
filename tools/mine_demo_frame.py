"""Extract the reference's real street demo frame + ground-truth plate boxes.

The reference's README pipeline figure (``/root/reference/imgs/image.png``,
produced by ``inference/run.py:118-280``) is a composite: the REAL capture
(a Ho-Chi-Minh-City intersection frame) at the top, with the reference
pipeline's own detections drawn on it (green box = plate #1, conf 0.93;
yellow box = plate #2, conf 0.89), plus the plate crops and OCR strings
below.  This tool cuts the photographic frame out of the composite and
records the two annotation rectangles as ground-truth plate boxes, giving
the repo its one real-photograph detection benchmark.

Frame rect in the 1400x900 composite: rows 10..505, cols 260..1140
(located by thresholding against the rgb(30,30,30) page background).
GT boxes located by the annotation colors inside the frame:
green (#1, 51G18593) and yellow (#2, 51A02352).

Output:
  tests/fixtures/real_frames/demo_frame.png   -- 880x495 RGB real capture
  tests/fixtures/real_frames/demo_frame.json  -- GT boxes + strings

Usage: python tools/mine_demo_frame.py
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

REF_IMG = "/root/reference/imgs/image.png"
OUT_DIR = "tests/fixtures/real_frames"

# (y0, y1, x0, x1) of the photographic frame inside the composite.
FRAME_RECT = (10, 505, 260, 1140)


def _locate_box(fr: np.ndarray, y0, y1, x0, x1, cond):
    """Tight extent of annotation-colored pixels inside a search window."""
    sub = fr[y0:y1, x0:x1].astype(int)
    r, g, b = sub[..., 0], sub[..., 1], sub[..., 2]
    ys, xs = np.where(cond(r, g, b))
    assert len(ys) > 50, "annotation box not found — composite layout changed?"
    return [int(x0 + xs.min()), int(y0 + ys.min()),
            int(x0 + xs.max()), int(y0 + ys.max())]


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    page = np.asarray(Image.open(REF_IMG).convert("RGB"))
    y0, y1, x0, x1 = FRAME_RECT
    frame = page[y0:y1, x0:x1]

    # The reference's drawn detection rectangles double as ground truth.
    box1 = _locate_box(frame, 290, 345, 410, 470,
                       lambda r, g, b: (g > 150) & (g - r > 60) & (g - b > 60))
    box2 = _locate_box(frame, 230, 270, 830, 880,
                       lambda r, g, b: (r > 180) & (g > 150) & (b < 90))

    Image.fromarray(frame).save(os.path.join(OUT_DIR, "demo_frame.png"))
    gt = {
        "source": REF_IMG,
        "frame_rect_in_composite_yyxx": list(FRAME_RECT),
        "plates": [
            {"text": "51G18593", "box_xyxy": box1, "two_row": True,
             "reference_conf": 0.93},
            {"text": "51A02352", "box_xyxy": box2, "two_row": True,
             "reference_conf": 0.89},
        ],
    }
    with open(os.path.join(OUT_DIR, "demo_frame.json"), "w") as f:
        json.dump(gt, f, indent=2)
    print(f"frame {frame.shape[1]}x{frame.shape[0]} -> {OUT_DIR}/demo_frame.png")
    for p in gt["plates"]:
        print(f"  {p['text']}: {p['box_xyxy']}")


if __name__ == "__main__":
    main()
