"""Host-side datasets feeding device batches.

Reference counterparts:
- LPSR paired dataset (``dataset/lpsr_dataset.py``): same-filename lr/hr
  folders, LR loaded RGB, **HR loaded grayscale** ("L"), resized to 192x32.
- CycleGAN unpaired dataset (``dataset/cycgans_dataset.py``): trainA indexed
  with wraparound, trainB sampled randomly, normalized to [-1, 1].

TPU re-design: datasets yield full numpy batches (NHWC float32) ready for
``jax.device_put``; no per-sample tensor conversion on the fly.
"""

from __future__ import annotations

import os
import random
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_images(folder: str) -> List[str]:
    return sorted(
        os.path.join(folder, f)
        for f in os.listdir(folder)
        if f.lower().endswith(IMG_EXTS)
    )


def _load(path: str, hw: Tuple[int, int], mode: str = "RGB") -> np.ndarray:
    img = Image.open(path).convert(mode)
    img = img.resize((hw[1], hw[0]), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


class PairedImageDataset:
    """LR/HR pairs by identical filename (reference lpsr_dataset.py:8-32)."""

    def __init__(self, hr_dir: str, lr_dir: str, hw: Tuple[int, int] = (32, 192),
                 hr_gray: bool = True):
        self.hw = hw
        self.hr_gray = hr_gray
        names = sorted(
            f for f in os.listdir(lr_dir) if f.lower().endswith(IMG_EXTS)
        )
        self.pairs = [
            (os.path.join(lr_dir, f), os.path.join(hr_dir, f))
            for f in names
            if os.path.exists(os.path.join(hr_dir, f))
        ]

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        lr_p, hr_p = self.pairs[i]
        lr = _load(lr_p, self.hw, "RGB")
        hr = _load(hr_p, self.hw, "L" if self.hr_gray else "RGB")
        return lr, hr

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_last: bool = False
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = list(range(len(self)))
        if shuffle:
            random.Random(seed).shuffle(idx)
        for s in range(0, len(idx), batch_size):
            chunk = idx[s : s + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            lrs, hrs = zip(*[self[i] for i in chunk])
            yield np.stack(lrs), np.stack(hrs)


class UnpairedImageDataset:
    """CycleGAN A/B domains (reference cycgans_dataset.py:15-83): index wraps
    A, B drawn at random; output in [-1, 1]."""

    def __init__(self, root: str, hw: Tuple[int, int] = (32, 192),
                 phase: str = "train", seed: int = 0):
        self.a = list_images(os.path.join(root, f"{phase}A"))
        self.b = list_images(os.path.join(root, f"{phase}B"))
        self.hw = hw
        self.rng = random.Random(seed)

    def __len__(self):
        return max(len(self.a), len(self.b))

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        a = _load(self.a[i % len(self.a)], self.hw) * 2.0 - 1.0
        b = _load(self.b[self.rng.randrange(len(self.b))], self.hw) * 2.0 - 1.0
        return a, b

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for s in range(0, len(self), batch_size):
            items = [self[i] for i in range(s, min(s + batch_size, len(self)))]
            a, b = zip(*items)
            yield np.stack(a), np.stack(b)
