"""CycleGAN image history pool (reference my_utils/utils.py:185-212).

Keeps up to ``pool_size`` previously generated fakes; each incoming fake is
either stored (pool not full), swapped with a random history entry (p=0.5),
or passed through.  Host-side control (tiny, batch-per-step), device arrays.
"""

from __future__ import annotations

import random
from typing import List

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images: List[np.ndarray] = []
        self.rng = random.Random(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, C).  Returns same-shape batch mixing history."""
        if self.pool_size == 0:
            return images
        out = []
        for img in np.asarray(images):
            if len(self.images) < self.pool_size:
                self.images.append(img)
                out.append(img)
            elif self.rng.random() > 0.5:
                idx = self.rng.randint(0, self.pool_size - 1)
                out.append(self.images[idx])
                self.images[idx] = img
            else:
                out.append(img)
        return np.stack(out)
