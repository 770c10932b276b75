"""Classical LR degradation synthesis, device-side and batched.

Reference: ``my_models/degradation.py`` (LPDegradationModel) — a stochastic
host/OpenCV pipeline applied per image: motion blur from random-walk kernels
(:91-127), lighting masks (ambient/parallel/spotlight on the HSV V channel,
:129-177), Gaussian blur (:53-54), bicubic downscale x0.35 (:63-78), Gaussian
noise (:80-83), resize to 192x32.

TPU re-design: every stage is a fixed-shape jnp expression driven by a JAX
PRNG key, vmappable over the batch — LR synthesis runs on-device at training
speed instead of one-CPU-image-at-a-time.  Random kernels use a static 13x13
support with masked dynamic length (dynamic shapes are not jittable).

Also includes the estimated real-blur-kernel path (``estimated-kn/*.mat``
loading via :func:`load_estimated_kernels`; application is a depthwise conv).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import image as im

KMAX = 13  # max motion-kernel support (reference range 7..13)


@dataclasses.dataclass(frozen=True)
class DegradationConfig:
    gaussian_sigma_range: Tuple[float, float] = (1.5, 3.0)
    noise_level_range: Tuple[float, float] = (0.01, 0.02)
    motion_kernel_size_range: Tuple[int, int] = (7, 13)
    brightness_weight_range: Tuple[float, float] = (0.3, 0.5)
    lr_hw: Tuple[int, int] = (32, 192)
    scale: float = 0.35
    p_motion: float = 0.7     # reference: random() > 0.3
    p_lighting: float = 0.3   # reference: random() > 0.7
    # Localized glare blob: a compact specular highlight covering ~one
    # character (headlight reflection / plate gloss).  Off by default —
    # p_glare=0.0 preserves the classical reference chain byte-exactly.
    # Real LR captures fail OCR on 1-2 characters at a time far more often
    # than uniform blur alone produces; this is the concentrated-damage
    # mode that closes that gap (see EVAL.md).
    p_glare: float = 0.0
    glare_radius_range: Tuple[float, float] = (0.35, 0.60)  # x plate height
    glare_alpha_range: Tuple[float, float] = (0.55, 0.95)


def _line_kernel(key) -> jnp.ndarray:
    """Straight motion-streak kernel (reference :94-106)."""
    k1, k2, k3 = jax.random.split(key, 3)
    size = jax.random.randint(k1, (), 7, KMAX + 1)
    center = size // 2
    angle = jax.random.uniform(k2, (), minval=0.0, maxval=2 * jnp.pi)
    length = jax.random.uniform(k3, (), minval=1.0, maxval=2.0) * (size / 4.0)
    t = jnp.arange(KMAX, dtype=jnp.float32)
    x = (center + jnp.cos(angle) * t).astype(jnp.int32)
    y = (center + jnp.sin(angle) * t).astype(jnp.int32)
    ok = (t < length) & (x >= 0) & (x < size) & (y >= 0) & (y < size)
    kern = jnp.zeros((KMAX, KMAX), jnp.float32)
    kern = kern.at[y, x].max(ok.astype(jnp.float32))
    return kern


def _walk_kernel(key) -> jnp.ndarray:
    """Random-walk motion kernel (reference :107-123)."""
    ks = jax.random.split(key, 4)
    size = jax.random.randint(ks[0], (), 7, KMAX + 1)
    center = (size // 2).astype(jnp.float32)
    n_steps = jax.random.randint(ks[1], (), 5, 11)
    angles0 = jax.random.uniform(ks[2], (), minval=0.0, maxval=360.0)
    deltas = jax.random.uniform(ks[3], (10, 2), minval=0.0, maxval=1.0)
    ang_changes = deltas[:, 0] * 60.0 - 30.0
    steps = deltas[:, 1] + 1.0  # step length in [1, 2]

    def body(carry, inp):
        x, y, ang = carry
        dang, step = inp
        ang = (ang + dang) % 360.0
        rad = jnp.deg2rad(ang)
        x = x + jnp.cos(rad) * step
        y = y + jnp.sin(rad) * step
        return (x, y, ang), (x, y)

    (_, _, _), (xs, ys) = jax.lax.scan(
        body, (center, center, angles0), (ang_changes, steps)
    )
    xs = jnp.concatenate([center[None], xs])
    ys = jnp.concatenate([center[None], ys])
    idx = jnp.arange(11)
    ok = (
        (idx <= n_steps)
        & (xs >= 0) & (xs < size.astype(jnp.float32))
        & (ys >= 0) & (ys < size.astype(jnp.float32))
    )
    kern = jnp.zeros((KMAX, KMAX), jnp.float32)
    kern = kern.at[ys.astype(jnp.int32), xs.astype(jnp.int32)].max(
        ok.astype(jnp.float32)
    )
    return kern


def motion_kernel(key) -> jnp.ndarray:
    """Random motion kernel, normalized (KMAX, KMAX)."""
    k1, k2 = jax.random.split(key)
    kern = jax.lax.cond(
        jax.random.uniform(k1) > 0.5, _line_kernel, _walk_kernel, k2
    )
    s = jnp.sum(kern)
    return jnp.where(s > 0, kern / jnp.maximum(s, 1e-8), kern)


def apply_kernel(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Per-channel 2-D filter, reflect border (reference
    my_utils/utils.py:176-180 apply_kernel_rgb)."""
    kh, kw = kern.shape
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    x = jnp.pad(img, (pad[0], pad[1], (0, 0)), mode="reflect")
    w = jnp.tile(kern[:, :, None, None], (1, 1, 1, img.shape[-1]))
    # cross-correlation like cv2.filter2D
    out = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1],
    )
    return out[0]


def gaussian_kernel_1d(sigma: jnp.ndarray, radius: int = 10) -> jnp.ndarray:
    """cv2.GaussianBlur(sigma, ksize=0) uses radius = round(4*sigma); we use
    a static max radius with a soft cutoff (negligible tail difference)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def gaussian_blur(img: jnp.ndarray, sigma: jnp.ndarray, radius: int = 10):
    g = gaussian_kernel_1d(sigma, radius)
    c = img.shape[-1]
    x = jnp.pad(img, ((radius, radius), (0, 0), (0, 0)), mode="reflect")
    wv = jnp.tile(g[:, None, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x[None], wv, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )[0]
    x = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="reflect")
    wh = jnp.tile(g[None, :, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x[None], wh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )[0]
    return x


def lighting_mask(key, hw: Tuple[int, int],
                  brightness_range: Tuple[float, float]) -> jnp.ndarray:
    """Random ambient / parallel / spotlight mask (reference :129-177)."""
    h, w = hw
    ks = jax.random.split(key, 6)
    choice = jax.random.randint(ks[0], (), 0, 3)

    intensity = jax.random.uniform(
        ks[1], (), minval=brightness_range[0], maxval=brightness_range[1]
    )
    ambient = jnp.full((h, w), intensity)

    horiz = jax.random.uniform(ks[2]) < 0.5
    flip = jax.random.uniform(ks[3]) < 0.5
    dx = jnp.arange(w, dtype=jnp.float32)
    dx = jnp.where(flip, w - 1 - dx, dx)
    mx = jnp.exp(-(dx**2) / (w / 1.5) ** 2)
    dy = jnp.arange(h, dtype=jnp.float32)
    dy = jnp.where(flip, h - 1 - dy, dy)
    my = jnp.exp(-(dy**2) / (h / 1.5) ** 2)
    parallel = jnp.where(horiz, jnp.tile(mx[None, :], (h, 1)),
                         jnp.tile(my[:, None], (1, w)))

    x0 = jax.random.randint(ks[4], (), 0, w).astype(jnp.float32)
    y0 = jax.random.randint(ks[5], (), 0, h).astype(jnp.float32)
    ii, jj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    d2 = (ii - y0) ** 2 + (jj - x0) ** 2
    spot = jnp.exp(-d2 / (max(h, w) / 1.5) ** 2)

    return jax.lax.switch(choice, [lambda: ambient, lambda: parallel,
                                   lambda: spot])


def glare_blob(key, img: jnp.ndarray,
               radius_range: Tuple[float, float],
               alpha_range: Tuple[float, float]) -> jnp.ndarray:
    """Screen a compact super-gaussian highlight over ~one character.

    The blob has a flat core with a sharp falloff (exp(-(d^2)^2)) so it
    saturates the strokes it covers instead of mildly brightening a wide
    area; center is kept inside the text band so it actually hits glyphs.
    """
    h, w = img.shape[:2]
    ks = jax.random.split(key, 4)
    x0 = jax.random.uniform(ks[0], (), minval=0.08 * w, maxval=0.92 * w)
    y0 = jax.random.uniform(ks[1], (), minval=0.25 * h, maxval=0.75 * h)
    r = jax.random.uniform(ks[2], (), minval=radius_range[0],
                           maxval=radius_range[1]) * h
    alpha = jax.random.uniform(ks[3], (), minval=alpha_range[0],
                               maxval=alpha_range[1])
    ii, jj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    d2 = ((ii - y0) ** 2 + (jj - x0) ** 2) / (r * r)
    blob = alpha * jnp.exp(-(d2 * d2))
    return jnp.clip(img + blob[..., None] * (1.0 - img), 0.0, 1.0)


class LPDegradation:
    """Batched stochastic degradation: HR [0,1] RGB -> LR (lr_hw)."""

    def __init__(self, cfg: DegradationConfig = DegradationConfig(),
                 hr_hw: Tuple[int, int] = (64, 384)):
        self.cfg = cfg
        self.hr_hw = hr_hw

        def one(key, hr):
            cfg_ = self.cfg
            ks = jax.random.split(key, 6)
            img = hr
            # motion blur
            kern = motion_kernel(ks[0])
            blurred = jnp.clip(apply_kernel(img, kern), 0.0, 1.0)
            img = jnp.where(jax.random.uniform(ks[1]) < cfg_.p_motion, blurred, img)
            # lighting
            mask = lighting_mask(ks[2], img.shape[:2], cfg_.brightness_weight_range)
            lit = im.hsv_value_scale(img, mask)
            img = jnp.where(jax.random.uniform(ks[3]) < cfg_.p_lighting, lit, img)
            # localized glare (scene-side: before optics blur / downscale)
            if cfg_.p_glare > 0.0:
                gk = jax.random.fold_in(key, 7)
                glared = glare_blob(jax.random.fold_in(gk, 1), img,
                                    cfg_.glare_radius_range,
                                    cfg_.glare_alpha_range)
                img = jnp.where(jax.random.uniform(gk) < cfg_.p_glare,
                                glared, img)
            # gaussian blur
            sigma = jax.random.uniform(
                ks[4], (), minval=cfg_.gaussian_sigma_range[0],
                maxval=cfg_.gaussian_sigma_range[1],
            )
            img = jnp.clip(gaussian_blur(img, sigma), 0.0, 1.0)
            # bicubic downscale then final resize (static shapes)
            dh = max(int(img.shape[0] * cfg_.scale), 1)
            dw = max(int(img.shape[1] * cfg_.scale), 1)
            img = jnp.clip(im.resize_bicubic(img, (dh, dw)), 0.0, 1.0)
            # noise
            lvl = jax.random.uniform(
                ks[5], (), minval=cfg_.noise_level_range[0],
                maxval=cfg_.noise_level_range[1],
            )
            img = img + lvl * jax.random.normal(jax.random.fold_in(ks[5], 1),
                                                img.shape)
            img = jnp.clip(img, 0.0, 1.0)
            return jnp.clip(im.resize_bilinear(img, cfg_.lr_hw), 0.0, 1.0)

        self._batch = jax.jit(jax.vmap(one))

    def __call__(self, key, hr_batch: jnp.ndarray) -> jnp.ndarray:
        keys = jax.random.split(key, hr_batch.shape[0])
        return self._batch(keys, hr_batch)


def load_estimated_kernels(folder: str,
                           kernel_hw: Tuple[int, int] = (11, 11)) -> np.ndarray:
    """Load every array from every .mat in ``folder``, bilinear-resized to
    kernel_hw (reference my_utils/utils.py:162-174 — minus its hard-coded
    absolute path).  Returns (N, kh, kw) float32."""
    from scipy.io import loadmat

    out = []
    for f in sorted(os.listdir(folder)):
        if not f.endswith(".mat"):
            continue
        data = loadmat(os.path.join(folder, f))
        for k, v in data.items():
            if k.startswith("__") or not isinstance(v, np.ndarray):
                continue
            arr = np.asarray(v, np.float32)
            arr = np.asarray(
                jax.image.resize(jnp.asarray(arr), kernel_hw, "linear")
            )
            out.append(arr)
    return np.stack(out) if out else np.zeros((0, *kernel_hw), np.float32)


def apply_estimated_kernel(key, img: jnp.ndarray,
                           kernels: jnp.ndarray) -> jnp.ndarray:
    """Pick a random estimated kernel and apply it (reference
    degradation.py:42-45, commented-out in upstream but part of the data
    pipeline design)."""
    i = jax.random.randint(key, (), 0, kernels.shape[0])
    return jnp.clip(apply_kernel(img, kernels[i]), 0.0, 1.0)
