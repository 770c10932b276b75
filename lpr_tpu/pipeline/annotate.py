"""Frame annotation / dashboard rendering (PIL; replaces the reference's
cv2-window dashboard in ``inference/run.py:216-268``).

Renders plate boxes, OCR / SR-OCR strings and an FPS counter onto frames;
used by the CLI pipeline app to write annotated output images/video frames.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont

_COLORS = [(0, 255, 128), (0, 215, 255), (255, 128, 0)]
_FONT_PATH = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf"


def _font(size: int):
    try:
        return ImageFont.truetype(_FONT_PATH, size)
    except Exception:  # pragma: no cover
        return ImageFont.load_default()


def annotate_frame(
    frame: np.ndarray,
    plates: List[Dict],
    fps: Optional[float] = None,
) -> np.ndarray:
    """frame: (H, W, 3) uint8 RGB; plates: recognizer output dicts."""
    img = Image.fromarray(frame.copy())
    d = ImageDraw.Draw(img)
    h = frame.shape[0]
    fs = max(14, h // 40)
    font = _font(fs)
    for i, p in enumerate(plates[:3]):
        color = _COLORS[i % len(_COLORS)]
        x1, y1, x2, y2 = [int(v) for v in p["box"]]
        d.rectangle([x1, y1, x2, y2], outline=color, width=max(2, h // 360))
        label = f"#{i+1} {p.get('text_sr') or p.get('text') or '?'}"
        d.text((x1, max(y1 - fs - 2, 0)), label, fill=color, font=font)
        sub = f"raw:{p.get('text','')} conf:{p.get('score',0):.2f}"
        d.text((x1, min(y2 + 2, frame.shape[0] - fs)), sub, fill=color,
               font=_font(max(10, fs * 2 // 3)))
    if fps is not None:
        d.text((8, 8), f"FPS: {fps:.1f}", fill=(144, 238, 144), font=font)
    return np.asarray(img)


def side_panel(
    plates: List[Dict], panel_hw=(300, 900)
) -> np.ndarray:
    """Detail panel: original vs SR crop + both OCR strings per plate
    (reference run.py display-panel logic, :216-260)."""
    ph, pw = panel_hw
    img = Image.new("RGB", (pw, ph), (30, 30, 30))
    d = ImageDraw.Draw(img)
    slot_w = pw // max(len(plates), 1) if plates else pw
    font = _font(16)
    for i, p in enumerate(plates[:3]):
        x0 = i * slot_w + 10
        y = 10
        color = _COLORS[i % len(_COLORS)]
        d.text((x0, y), f"Plate #{i+1} conf {p.get('score', 0):.2f}",
               fill=(173, 216, 230), font=font)
        y += 24
        sr = p.get("sr")
        if sr is not None:
            arr = np.asarray(sr)
            if arr.ndim == 3 and arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, -1)
            crop = Image.fromarray(
                (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            ).resize((slot_w - 20, 40))
            img.paste(crop, (x0, y))
            y += 48
        d.text((x0, y), f"OCR:    {p.get('text','')}", fill=(200, 200, 200),
               font=font)
        y += 22
        d.text((x0, y), f"SR OCR: {p.get('text_sr','')}", fill=color, font=font)
    return np.asarray(img)
