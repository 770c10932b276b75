"""Device-side image ops: resize, letterbox, oriented crop sampling, skew
estimation.

The reference does all of this on the host with OpenCV/PIL
(``my_models/detection.py:73-93`` ResizeImg, ``yolov5/utils/augmentations.py:91-121``
letterbox, ``my_utils/utils.py:75-149`` Hough deskew, ``inference/run.py:21-77``
row reshaping).  Here every transform is a fixed-shape gather/arithmetic
expression so whole frames stay in HBM through the pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def uint8_to_float(x: Array) -> Array:
    """uint8 [0,255] -> f32 [0,1] (reference my_utils/utils.py:152-154)."""
    return x.astype(jnp.float32) / 255.0


def float_to_uint8(x: Array) -> Array:
    """f32 [0,1] -> uint8, round-half-away like the reference single2uint
    (my_utils/utils.py:157-159)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def rgb_to_gray(x: Array) -> Array:
    """ITU-R BT.601 luma (OpenCV convention)."""
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.tensordot(x, w, axes=[[-1], [0]])


def resize_bilinear(x: Array, out_hw: Tuple[int, int]) -> Array:
    """Bilinear resize, NHWC or HWC."""
    if x.ndim == 3:
        return jax.image.resize(x, (out_hw[0], out_hw[1], x.shape[-1]), "linear")
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[-1]), "linear"
    )


def resize_bicubic(x: Array, out_hw: Tuple[int, int]) -> Array:
    if x.ndim == 3:
        return jax.image.resize(x, (out_hw[0], out_hw[1], x.shape[-1]), "cubic")
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[-1]), "cubic"
    )


def letterbox_geom(
    h: int, w: int, out_hw: Tuple[int, int], scaleup: bool = True,
) -> Tuple[float, Tuple[int, int], Tuple[int, int]]:
    """Letterbox geometry only: (gain, (nh, nw), (pad_left, pad_top)).
    Shared by :func:`letterbox` and host-side packers so coordinate
    inversion stays exact when the resize happens off-device."""
    oh, ow = out_hw
    gain = min(oh / h, ow / w)
    if not scaleup:
        gain = min(gain, 1.0)
    nh, nw = int(round(h * gain)), int(round(w * gain))
    return gain, (nh, nw), ((ow - nw) // 2, (oh - nh) // 2)


def letterbox(
    x: Array, out_hw: Tuple[int, int], fill: float = 114.0 / 255.0,
    scaleup: bool = True,
) -> Tuple[Array, Array, Array]:
    """Aspect-preserving resize + center pad for a full batch, the device
    analogue of reference letterbox(auto=False) / ResizeImg.

    x: (B, H, W, C) float.  Static input/output sizes; per-batch uniform.
    Returns (out (B, oh, ow, C), gain (), pad (2,) = (pad_x, pad_y)).
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    gain, (nh, nw), (pad_left, pad_top) = letterbox_geom(
        h, w, out_hw, scaleup)
    resized = x if (nh, nw) == (h, w) else resize_bilinear(x, (nh, nw))
    out = jnp.pad(
        resized,
        ((0, 0), (pad_top, oh - nh - pad_top), (pad_left, ow - nw - pad_left),
         (0, 0)),
        constant_values=jnp.asarray(fill, x.dtype),
    )
    return out, jnp.float32(gain), jnp.asarray([pad_left, pad_top], jnp.float32)


def sample_bilinear(img: Array, ys: Array, xs: Array) -> Array:
    """Bilinear sample img (H, W, C) at fractional coords ys/xs (h, w) with
    border-replicate.  Returns (h, w, C)."""
    H, W, C = img.shape
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def crop_rotated(
    img: Array,
    box: Array,
    angle: Array,
    out_hw: Tuple[int, int],
    v_range: Tuple[float, float] = (-0.5, 0.5),
    mask_outside: bool = False,
    square: bool = False,
) -> Array:
    """Sample an axis-aligned box from ``img`` under a rotation about the box
    center — the fused device replacement for crop + warpAffine deskew
    (my_utils/utils.py:137-147).

    box: (4,) xyxy in image px.  angle: () radians (positive = box content is
    tilted CCW; we sample along the tilted axes to straighten it).
    v_range selects a vertical sub-span of the box in normalized units
    (e.g. (-0.5, 0.0) = top half) for 2-row -> 1-row reshaping.
    square=True samples a square region of side max(w, h) (aspect-preserving
    canvas like ResizeImg); with mask_outside=True, content outside the box
    is zeroed (the black pad of ResizeImg).
    """
    oh, ow = out_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    v0, v1 = v_range
    # normalized output grid in box coords
    u = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow - 0.5  # [-0.5, 0.5)
    v = v0 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh * (v1 - v0)
    uu, vv = jnp.meshgrid(u, v)  # (oh, ow)
    if square:
        side = jnp.maximum(bw, bh)
        du = uu * side
        dv = vv * side
    else:
        du = uu * bw
        dv = vv * bh  # full box when v_range=(-0.5, 0.5); sub-span otherwise
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # continuous coords -> index space (pixel i spans [i, i+1), center i+0.5)
    xs = cx + du * ca - dv * sa - 0.5
    ys = cy + du * sa + dv * ca - 0.5
    out = sample_bilinear(img, ys, xs)
    if mask_outside:
        inside = (jnp.abs(du) <= bw / 2) & (dv >= bh * v0) & (dv <= bh * v1)
        out = out * inside[..., None]
    return out


def sobel_gradients(gray: Array) -> Tuple[Array, Array]:
    """3x3 Sobel gx, gy on (H, W) image (replicate border)."""
    g = jnp.pad(gray, ((1, 1), (1, 1)), mode="edge")
    gx = (
        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
    )
    gy = (
        (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
    )
    return gx, gy


def estimate_skew_angle(
    gray: Array, max_abs_deg: float = 45.0, pixel_aspect: Array | float = 1.0
) -> Array:
    """Dominant near-horizontal edge orientation via the structure tensor —
    the device-side deterministic replacement for the reference's
    Canny+Hough median-angle deskew (my_utils/utils.py:98-124).

    For a tilted plate, character strokes and plate borders produce strong
    gradients whose dominant *edge* orientation equals the tilt.  The
    structure-tensor double-angle average is rotation-equivariant and cheap:
    theta = 0.5 * atan2(2*mean(gx*gy), mean(gx^2 - gy^2)) gives the dominant
    gradient direction; edges are perpendicular to it.
    Returns the rotation angle (radians) that straightens the image,
    clamped to +-max_abs_deg.
    """
    gx, gy = sobel_gradients(gray)
    # weight by gradient magnitude^2, which the products already are
    j_xy = jnp.mean(2.0 * gx * gy)
    j_dd = jnp.mean(gx * gx - gy * gy)
    theta = 0.5 * jnp.arctan2(j_xy, j_dd)  # dominant gradient direction
    # edge direction = theta - pi/2; tilt of horizontal structures:
    tilt = theta - jnp.pi / 2
    # wrap to (-pi/2, pi/2]
    tilt = jnp.where(tilt <= -jnp.pi / 2, tilt + jnp.pi, tilt)
    tilt = jnp.where(tilt > jnp.pi / 2, tilt - jnp.pi, tilt)
    # Undo anisotropic crop scaling: ``pixel_aspect`` = (source units per
    # x-pixel) / (source units per y-pixel) of the image we measured on.
    tilt = jnp.arctan(jnp.tan(tilt) / pixel_aspect)
    lim = jnp.deg2rad(max_abs_deg)
    return jnp.clip(tilt, -lim, lim)


def hsv_value_scale(rgb: Array, scale: Array) -> Array:
    """Scale the HSV V channel of an RGB [0,1] image without leaving RGB:
    V = max(R,G,B); scaling V scales all channels proportionally when the
    max is clipped (matches reference lighting masks applied to V,
    my_models/degradation.py:163-177, for the common non-saturating case)."""
    v = jnp.max(rgb, axis=-1, keepdims=True)
    new_v = jnp.clip(v * scale[..., None], 0.0, 1.0)
    ratio = jnp.where(v > 0, new_v / jnp.maximum(v, 1e-6), 0.0)
    return rgb * ratio
