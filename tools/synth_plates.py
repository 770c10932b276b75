"""Synthetic license-plate rendering for tests/verification.

Renders plausible plate crops (1-row and 2-row, light background, dark bold
glyphs) with PIL — used as eval-set stand-ins since the reference's real
1050-image eval set doesn't ship with the repo.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf"
CHARS = "0123456789ABCDEFGHKLMNPRSTUVXYZ"


def random_plate_text(rng: random.Random, two_row: bool = False) -> str:
    if two_row:
        return (
            "".join(rng.choice("0123456789") for _ in range(2))
            + rng.choice("ABCDEFGHKLMNPRSTUVXYZ")
            + "".join(rng.choice("0123456789") for _ in range(5))
        )
    return (
        "".join(rng.choice("0123456789") for _ in range(2))
        + rng.choice("ABCDEFGHKLMNPRSTUVXYZ")
        + "".join(rng.choice("0123456789") for _ in range(4))
    )


def render_plate(
    text: str,
    two_row: bool = False,
    size: Optional[Tuple[int, int]] = None,
    bg=(230, 230, 225),
    fg=(20, 20, 25),
    angle_deg: float = 0.0,
) -> np.ndarray:
    """Render a plate crop; two_row splits the text across two lines
    (row split after char 3, Vietnamese-style)."""
    if size is None:
        size = (140, 100) if two_row else (280, 64)
    w, h = size
    img = Image.new("RGB", (w, h), bg)
    d = ImageDraw.Draw(img)
    d.rectangle([1, 1, w - 2, h - 2], outline=(60, 60, 70), width=2)
    if two_row:
        rows = [text[:3], text[3:]]
        fs = int(h * 0.38)
        font = ImageFont.truetype(FONT, fs)
        for r, row in enumerate(rows):
            tw = d.textlength(row, font=font)
            d.text(((w - tw) / 2, h * (0.06 + 0.47 * r)), row, fill=fg, font=font)
    else:
        fs = int(h * 0.68)
        font = ImageFont.truetype(FONT, fs)
        tw = d.textlength(text, font=font)
        d.text(((w - tw) / 2, h * 0.1), text, fill=fg, font=font)
    if angle_deg:
        img = img.rotate(angle_deg, resample=Image.BICUBIC, expand=False,
                         fillcolor=bg)
    return np.asarray(img, np.uint8)


def render_frame_with_plates(
    frame_hw: Tuple[int, int],
    plates: List[Tuple[str, bool, Tuple[int, int, int, int]]],
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    """Compose a street-ish frame with plates pasted at given xyxy boxes."""
    rng = rng or random.Random(0)
    h, w = frame_hw
    noise = (np.random.RandomState(rng.randint(0, 1 << 30))
             .randint(40, 90, (h, w, 3))).astype(np.uint8)
    frame = noise
    for text, two_row, (x1, y1, x2, y2) in plates:
        crop = render_plate(text, two_row, size=(x2 - x1, y2 - y1))
        frame[y1:y2, x1:x2] = crop
    return frame


def degrade(img_u8: np.ndarray, blur_sigma: float = 1.2,
            noise: float = 8.0, down: float = 0.45,
            seed: int = 0) -> np.ndarray:
    """Cheap LR degradation (blur + downscale + noise) for eval realism."""
    from PIL import ImageFilter

    rng = np.random.RandomState(seed)
    pil = Image.fromarray(img_u8)
    pil = pil.filter(ImageFilter.GaussianBlur(blur_sigma))
    h, w = img_u8.shape[:2]
    small = pil.resize((max(int(w * down), 8), max(int(h * down), 8)),
                       Image.BICUBIC)
    pil = small.resize((w, h), Image.BICUBIC)
    arr = np.asarray(pil, np.float32)
    arr = np.clip(arr + rng.normal(0, noise, arr.shape), 0, 255)
    return arr.astype(np.uint8)
