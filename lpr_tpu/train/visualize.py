"""Per-epoch visualization grids for the trainers.

Reference: ``train/lpsr.py:48-94`` (LR | SR | HR matplotlib grid per epoch)
and ``train/cyclegans.py:148-183`` (6-panel real/fake/reconstructed grid).
PIL-based (no display server needed); written next to checkpoints.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = np.repeat(img, 3, -1)
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def image_grid(rows: Sequence[Sequence[np.ndarray]],
               titles: Optional[Sequence[str]] = None,
               cell_hw=(64, 384), pad: int = 6) -> np.ndarray:
    """rows of images -> one grid image (each cell resized to cell_hw)."""
    ch, cw = cell_hw
    n_rows = len(rows)
    n_cols = max(len(r) for r in rows)
    header = 20 if titles else 0
    H = n_rows * (ch + pad) + pad + header
    W = n_cols * (cw + pad) + pad
    canvas = Image.new("RGB", (W, H), (24, 24, 24))
    if titles:
        d = ImageDraw.Draw(canvas)
        for c, t in enumerate(titles[:n_cols]):
            d.text((pad + c * (cw + pad) + 4, 4), t, fill=(200, 200, 200))
    for r, row in enumerate(rows):
        for c, img in enumerate(row):
            cell = Image.fromarray(_to_u8(img)).resize((cw, ch))
            canvas.paste(cell, (pad + c * (cw + pad),
                                header + pad + r * (ch + pad)))
    return np.asarray(canvas)


def save_lpsr_epoch_grid(path: str, lr_imgs, sr_imgs, hr_imgs) -> None:
    """LR | SR | HR rows (reference train/lpsr.py visualize_results)."""
    rows = [
        [np.asarray(lr_imgs[i]), np.asarray(sr_imgs[i]), np.asarray(hr_imgs[i])]
        for i in range(min(len(lr_imgs), 4))
    ]
    grid = image_grid(rows, titles=["Original LR", "Super-Resolved", "GT HR"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)


def save_cyclegan_epoch_grid(path: str, real_a, fake_b, rec_a,
                             real_b, fake_a, rec_b) -> None:
    """real_A | fake_B | rec_A / real_B | fake_A | rec_B
    (reference train/cyclegans.py:148-183), [-1,1] inputs."""
    def dn(x):
        return np.asarray(x) * 0.5 + 0.5

    rows = [
        [dn(real_a[0]), dn(fake_b[0]), dn(rec_a[0])],
        [dn(real_b[0]), dn(fake_a[0]), dn(rec_b[0])],
    ]
    grid = image_grid(rows, titles=["real", "fake", "reconstructed"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
