"""Box geometry ops — all jittable, fixed-shape (reference counterparts:
``yolov5/utils/general.py:572-674``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh2xyxy(b):
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy2xywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def clip_boxes(b, h, w):
    """Clamp xyxy boxes to image bounds (general.py:665-674)."""
    return jnp.stack(
        [
            jnp.clip(b[..., 0], 0, w),
            jnp.clip(b[..., 1], 0, h),
            jnp.clip(b[..., 2], 0, w),
            jnp.clip(b[..., 3], 0, h),
        ],
        -1,
    )


def scale_coords(boxes, from_hw, to_hw, ratio_pad=None):
    """Map xyxy boxes from letterboxed ``from_hw`` space back to original
    ``to_hw`` space (general.py:648-662).  Shapes may be traced scalars."""
    fh, fw = from_hw
    th, tw = to_hw
    if ratio_pad is None:
        gain = jnp.minimum(fh / th, fw / tw)
        pad_x = (fw - tw * gain) / 2
        pad_y = (fh - th * gain) / 2
    else:
        gain = ratio_pad[0]
        pad_x, pad_y = ratio_pad[1]
    out = jnp.stack(
        [
            (boxes[..., 0] - pad_x) / gain,
            (boxes[..., 1] - pad_y) / gain,
            (boxes[..., 2] - pad_x) / gain,
            (boxes[..., 3] - pad_y) / gain,
        ],
        -1,
    )
    return clip_boxes(out, th, tw)


def box_iou(a, b):
    """Pairwise IoU. a: (..., M, 4), b: (..., N, 4) xyxy -> (..., M, N)."""
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * jnp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:4], b[..., None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def bbox_ciou(pred, target, eps: float = 1e-7):
    """CIoU between aligned boxes in xywh (cx,cy,w,h) — the YOLO box loss
    (reference ``yolov5/utils/metrics.py`` bbox_iou(CIoU=True))."""
    px, py, pw, ph = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    tx, ty, tw, th = target[..., 0], target[..., 1], target[..., 2], target[..., 3]
    p_x1, p_x2 = px - pw / 2, px + pw / 2
    p_y1, p_y2 = py - ph / 2, py + ph / 2
    t_x1, t_x2 = tx - tw / 2, tx + tw / 2
    t_y1, t_y2 = ty - th / 2, ty + th / 2
    iw = jnp.maximum(jnp.minimum(p_x2, t_x2) - jnp.maximum(p_x1, t_x1), 0)
    ih = jnp.maximum(jnp.minimum(p_y2, t_y2) - jnp.maximum(p_y1, t_y1), 0)
    inter = iw * ih
    union = pw * ph + tw * th - inter + eps
    iou = inter / union
    cw = jnp.maximum(p_x2, t_x2) - jnp.minimum(p_x1, t_x1)
    ch = jnp.maximum(p_y2, t_y2) - jnp.minimum(p_y1, t_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = (tx - px) ** 2 + (ty - py) ** 2
    v = (4 / jnp.pi**2) * (jnp.arctan(tw / (th + eps)) - jnp.arctan(pw / (ph + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)
