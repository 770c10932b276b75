"""MXU-native image resampling: interpolation as matrix multiplication.

TPU gathers are slow (measured ~6x slower than the equivalent matmuls for
the pipeline's crop geometry); the MXU is idle during them.  This module
reformulates every resampling in the hot path as dense interpolation-matrix
contractions:

- :func:`resize_matmul` — separable bilinear resize ``Ry @ img @ Rx^T``.
- :func:`extract_tile` — axis-aligned box crop+resize from a full frame via
  two per-plate interp matmuls.
- :func:`affine_resample` — arbitrary affine warps (rotation/deskew/shear)
  via the Catmull-Smith two-pass decomposition: a per-source-row horizontal
  resample followed by a per-output-column vertical resample, each a batched
  matmul with on-the-fly 2-tap bilinear matrices.
- :func:`crop_rotated_fast` — drop-in fast variant of
  :func:`lpr_tpu.ops.image.crop_rotated` (same geometry/semantics): stage-1
  tile extraction + stage-2 affine, everything on the MXU.

Coordinate conventions match ``ops.image.sample_bilinear``: continuous box
coords with pixel centers at i+0.5; border replicate via index clipping.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def interp_weights(pos: Array, n_in: int) -> Array:
    """Bilinear row-interpolation matrix.

    pos: (..., n_out) fractional source indices (index space).
    Returns (..., n_out, n_in) with 2 taps per row; positions are clipped to
    the valid range (border replicate).
    """
    pos = jnp.clip(pos, 0.0, n_in - 1.0)
    src = jnp.arange(n_in, dtype=pos.dtype)
    d = 1.0 - jnp.abs(pos[..., :, None] - src)
    return jnp.clip(d, 0.0, 1.0)


def resize_matmul(img: Array, out_hw: Tuple[int, int]) -> Array:
    """Separable bilinear resize, (..., H, W, C) -> (..., oh, ow, C)."""
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_hw
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
    ry = interp_weights(ys, h)
    ry = (ry / jnp.maximum(ry.sum(-1, keepdims=True), 1e-8)).astype(img.dtype)
    rx = interp_weights(xs, w)
    rx = (rx / jnp.maximum(rx.sum(-1, keepdims=True), 1e-8)).astype(img.dtype)
    t = jnp.einsum("oh,...hwc->...owc", ry, img)
    return jnp.einsum("pw,...owc->...opc", rx, t)


def extract_tile(
    frame: Array,
    center: Array,     # (2,) cx, cy continuous frame coords
    ext_wh: Array,     # (2,) extracted region size (frame px)
    tile_hw: Tuple[int, int],
) -> Array:
    """Axis-aligned crop+resize of ``frame`` (H, W, C) to a (Th, Tw, C) tile
    via two interp matmuls (border replicate)."""
    H, W, _ = frame.shape
    th, tw = tile_hw
    cx, cy = center[0], center[1]
    ew, eh = ext_wh[0], ext_wh[1]
    ys = cy - eh / 2 + (jnp.arange(th, dtype=jnp.float32) + 0.5) * (eh / th) - 0.5
    xs = cx - ew / 2 + (jnp.arange(tw, dtype=jnp.float32) + 0.5) * (ew / tw) - 0.5
    ry = interp_weights(ys, H)
    ry = (ry / jnp.maximum(ry.sum(-1, keepdims=True), 1e-8)).astype(frame.dtype)
    rx = interp_weights(xs, W)
    rx = (rx / jnp.maximum(rx.sum(-1, keepdims=True), 1e-8)).astype(frame.dtype)
    t = jnp.einsum("th,hwc->twc", ry, frame)
    return jnp.einsum("pw,twc->tpc", rx, t)


def affine_resample(
    tile: Array,                       # (Th, Tw, C)
    origin: Array,                     # (2,) u, v at output (0, 0)
    du_j: Array,                       # (2,) per-output-column step (u, v)
    dv_i: Array,                       # (2,) per-output-row step (u, v)
    out_hw: Tuple[int, int],
) -> Array:
    """Catmull-Smith two-pass affine warp.

    Sampling coords (index space): (u, v)(i, j) = origin + j*du_j + i*dv_i.
    Pass 1 resamples each source row horizontally with
    u'(vr, j) = j*(a - b*c/d) + vr*(b/d) + (tu - b*tv/d); pass 2 resamples
    each output column vertically with v(i, j) = c*j + d*i + tv.
    Requires |d| (the i->v step) bounded away from 0 — true for deskew
    rotations < ~60 degrees.
    """
    th, tw, _ = tile.shape
    oh, ow = out_hw
    a, c = du_j[0], du_j[1]
    b, d = dv_i[0], dv_i[1]
    tu, tv = origin[0], origin[1]
    d = jnp.where(jnp.abs(d) < 1e-3, jnp.sign(d) * 1e-3 + (d == 0) * 1e-3, d)

    j_idx = jnp.arange(ow, dtype=jnp.float32)
    vr = jnp.arange(th, dtype=jnp.float32)
    # pass 1: per source row, horizontal positions (th, ow)
    u_p1 = (j_idx[None, :] * (a - b * c / d)
            + vr[:, None] * (b / d) + (tu - b * tv / d))
    m1 = interp_weights(u_p1, tw).astype(tile.dtype)   # (th, ow, tw)
    f1 = jnp.einsum("rjw,rwc->rjc", m1, tile)  # (th, ow, C)
    # pass 2: per output column, vertical positions (ow, oh)
    i_idx = jnp.arange(oh, dtype=jnp.float32)
    v_p2 = c * j_idx[:, None] + d * i_idx[None, :] + tv  # (ow, oh)
    m2 = interp_weights(v_p2, th).astype(tile.dtype)   # (ow, oh, th)
    out = jnp.einsum("jir,rjc->ijc", m2, f1)   # (oh, ow, C)
    return out


MAX_DESKEW_DEG = 15.0  # rotation budget the tile margins are sized for


def crop_rotated_fast(
    frame: Array,
    box: Array,
    angle: Array,
    out_hw: Tuple[int, int],
    v_range: Tuple[float, float] = (-0.5, 0.5),
    mask_outside: bool = False,
    square: bool = False,
    tile_hw: Tuple[int, int] = (64, 256),
    tile: Array = None,
    tile_geom=None,
) -> Array:
    """MXU-native equivalent of ``ops.image.crop_rotated``.

    Optionally reuse a precomputed ``(tile, tile_geom)`` from
    :func:`plate_tile` so several outputs (SR crop, OCR canvas, halves)
    share one stage-1 extraction.
    """
    if tile is None:
        tile, tile_geom = plate_tile(frame, box, tile_hw)
    cx_t, cy_t, su, sv = tile_geom  # frame->tile: u = (x - cx)*su + Tw/2 ...
    th, tw = tile.shape[0], tile.shape[1]
    oh, ow = out_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    v0, v1 = v_range
    if square:
        side = jnp.maximum(bw, bh)
        w_span, h_span = side, side
    else:
        w_span, h_span = bw, bh
    ca, sa = jnp.cos(angle), jnp.sin(angle)

    def src_uv(i, j):
        uu = (j + 0.5) / ow - 0.5
        vv = v0 + (i + 0.5) / oh * (v1 - v0)
        du = uu * w_span
        dv = vv * h_span
        xf = cx + du * ca - dv * sa - 0.5
        yf = cy + du * sa + dv * ca - 0.5
        # frame index -> tile index
        u = (xf - (cx_t - 0.5)) * su + (tw - 1) / 2
        v = (yf - (cy_t - 0.5)) * sv + (th - 1) / 2
        return jnp.stack([u, v])

    o = src_uv(0.0, 0.0)
    duj = src_uv(0.0, 1.0) - o
    dvi = src_uv(1.0, 0.0) - o
    out = affine_resample(tile, o, duj, dvi, out_hw)
    if mask_outside:
        jj = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow - 0.5
        ii = v0 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh * (v1 - v0)
        du = jj[None, :] * w_span
        dv = ii[:, None] * h_span
        inside = ((jnp.abs(du) <= bw / 2)
                  & (dv >= bh * (-0.5)) & (dv <= bh * 0.5))
        out = out * inside[..., None]
    return out


def plate_tile(frame: Array, box: Array, tile_hw: Tuple[int, int] = (64, 256)):
    """Stage-1 extraction: axis-aligned region around ``box`` sized to cover
    any rotation up to MAX_DESKEW_DEG, resized to a fixed tile.

    Returns (tile (Th, Tw, C), geom (cx, cy, su, sv)) where su/sv convert
    frame-px offsets from the box center into tile-px offsets.
    """
    th, tw = tile_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    slack = jnp.tan(jnp.deg2rad(MAX_DESKEW_DEG))
    # cover the square OCR canvas (side = max(bw, bh)) plus rotation slack
    side = jnp.maximum(bw, bh)
    ew = 1.05 * side + slack * bh
    eh = 1.05 * bh + slack * side
    tile = extract_tile(frame, jnp.stack([cx, cy]), jnp.stack([ew, eh]),
                        tile_hw)
    su = tw / ew
    sv = th / eh
    return tile, (cx, cy, su, sv)
