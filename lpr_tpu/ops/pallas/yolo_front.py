"""Fused Pallas kernel for the YOLO high-resolution front end.

Fuses the three layers that dominate the detector's runtime at 736x1280 —
the S2D-transformed stem conv (12->32), the stride-2 downsample (32->64)
and the first C3 block (64->64, n=1) — into one VMEM-resident kernel.
XLA runs these high-res small-channel convs poorly (9.7-17 TF/s, see
tools/bench_convs.py): with C in {12..64} the feature dim is lane-starved
and every layer round-trips its 0.5-1.9 GB activation through HBM.  Here
each (image, 4-row strip) grid cell computes all three layers in VMEM.

Layout: channel-major QUARTER-GRID parity planes.  Activations live as 2D
(C, rows*CP) bf16 arrays — channels on sublanes, row-major spatial on
lanes — and the spatial grid is split by row parity x column parity into
four quarter planes.  A 3x3 conv tap then maps to (source plane, uniform
lane shift) for BOTH stride-1 and stride-2 layers, so every layer is just
a handful of aligned block copies into a (K, N) im2col buffer followed by
ONE MXU matmul (K = kh*kw*Cin on sublanes, spatial streaming on lanes):
the stem is one (32,144)x(144, 4*KQ*CP) matmul covering all four output
planes, the stride-2 downsample one (64,288)x(288, DROWS*CP) matmul.

Geometry bookkeeping (strip s, STRIP C3-output rows each):
- input: the letterboxed frame packed by ONE XLA transpose into 4 parity
  planes x 16 channels (12 S2D channels + 4 alignment pads) on the
  184x320 quarter grid, rows padded to RP, cols to CP = 384 = 3*128 so
  each row's lane offset is DMA-aligned; per strip the kernel DMAs
  quarter rows [STRIP*s, +WIN).
- real col d maps to grid col q = d + 4; pad cols hold zeros, and a
  lane-wrap across a row boundary lands on a pad col of the neighboring
  row, so uniform lane-shift slices implement exact zero padding.
- out-of-domain positions that a plain conv would zero-pad (image
  top/bottom rows, left/right cols) are re-zeroed after each layer with a
  computed domain mask, keeping bit-parity with the XLA composition.

Reference architecture being fused: yolov5s-v6.0 layers 0-2
(yolov5/models/common.py:37-49 Conv, :126-138 C3) as built by
lpr_tpu.models.yolo.build_yolo with the S2D stem transform.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import nn as tnn


class FrontGeom(NamedTuple):
    """Grid geometry for one detector input size (see module docstring).

    Derived, not hard-coded, so both the production rect 736x1280 path and
    the reference-parity square 1280x1280 path run the fused kernel."""

    rows: int     # s2d rows (H / 2)
    cols: int     # per parity plane (W / 4)
    cp: int       # padded plane cols (4 left + right pad to a 128 multiple)
    strip: int    # C3 output rows per grid cell
    c3rows: int   # output rows (H / 4)
    nstrip: int
    drows: int    # down1 rows computed per strip
    kq: int       # stem quarter-rows computed per strip
    win: int      # input window quarter-rows per strip
    rp: int       # padded quarter rows


def best_strip(h: int, cap: int = 32) -> int:
    """Largest C3-row strip that tiles the (h/4)-row output exactly, capped
    so VMEM scratch stays well under the 128 MiB physical budget.  Bigger
    strips amortize per-grid-cell overheads (DMA issue, prologue, halo
    recompute): 184 rows at strip 23 runs the kernel 9.33 vs 10.00 ms/step
    at strip 8 (batch 32), bit-identical output."""
    c3rows = h // 4
    return max(d for d in range(1, min(cap, c3rows) + 1) if c3rows % d == 0)


def front_geom(h: int, w: int, strip: Optional[int] = None) -> FrontGeom:
    """Geometry for a (h, w) detector input.  Requires h % 32 == 0 (whole
    strips) and w % 64 == 0 (128-aligned output strip rows)."""
    if strip is None:
        strip = best_strip(h)
    if h % 32 or h % (4 * strip) or w % 64:
        raise ValueError(f"fused front needs H % {4 * strip} == 0 and "
                         f"W % 64 == 0, got {(h, w)}")
    cols = w // 4
    # padded plane cols (4 left + pad right): multiple of 128 keeps every
    # row's lane offset 128-aligned, which Mosaic requires for the
    # HBM->VMEM strip DMA slices (needs >= 1 spare col for the +1 shift)
    cp = 128 * ((cols + 8 + 127) // 128)
    c3rows = h // 4
    kq = strip + 3
    win = kq + 4
    return FrontGeom(
        rows=h // 2, cols=cols, cp=cp, strip=strip, c3rows=c3rows,
        nstrip=c3rows // strip, drows=strip + 2, kq=kq, win=win,
        rp=strip * (c3rows // strip - 1) + win,
    )


# default geometry (the benched production path, detector at 736x1280 ->
# s2d plane 368x640); module-level aliases kept for readability/tests
_G0 = front_geom(736, 1280)
ROWS, COLS, CP = _G0.rows, _G0.cols, _G0.cp
STRIP, C3ROWS, NSTRIP = _G0.strip, _G0.c3rows, _G0.nstrip
DROWS, KQ, WIN, RP = _G0.drows, _G0.kq, _G0.win, _G0.rp


def _silu_f32(x):
    y = x * jax.nn.sigmoid(x)
    return jnp.where(jnp.abs(y) < 1e-30, 0.0, y)


def pack_front_frames(x: jax.Array) -> jax.Array:
    """Letterboxed frames (B, H, W, 3) -> (B, 64, RP*CP) quarter-grid
    parity-packed planes, one XLA transpose.

    Plane channel index = rho*24 + pp*12 + c*4 + i*2 + j where (rho, pp)
    are the s2d-grid row/col parities and (c, i, j) the S2D channel of
    ``tnn.pixel_unshuffle``: plane[ch, k, ce] = img[4k+2*rho+i,
    4*ce+2*pp+j, c]."""
    B = x.shape[0]
    g = front_geom(x.shape[1], x.shape[2])
    z = x.reshape(B, g.c3rows, 2, 2, g.cols, 2, 2, 3)   # b k rho i ce pp j c
    z = jnp.transpose(z, (0, 2, 5, 7, 3, 6, 1, 4))  # b rho pp c i j k ce
    z = z.reshape(B, 4, 12, g.c3rows, g.cols)
    # pad each plane's channel block 12 -> 16 so every in-kernel plane
    # read is sublane-tile aligned (bf16 tiles are 16 sublanes)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, 4), (4, g.rp - g.c3rows - 4),
                    (4, g.cp - g.cols - 4)))
    return z.reshape(B, 64, g.rp * g.cp)


@functools.lru_cache(maxsize=1)
def _pack_conv_weight_np() -> np.ndarray:
    """(4, 4, 3, 64) HWIO 0/1 kernel: stride-4 conv == the whole
    quarter-grid pack.  Output channel p = plane*16 + s2dch with
    plane = (a//2)*2 + b//2 and s2dch = c*4 + (a%2)*2 + b%2 for patch
    offset (a, b) and input channel c; channels 12-15 of each plane stay
    zero (the sublane-tile pad).  Cached as NUMPY (a cached jax.Array
    would capture a tracer when first built under jit)."""
    w = np.zeros((4, 4, 3, 64), np.float32)
    for a in range(4):
        for b in range(4):
            for c in range(3):
                p = ((a // 2) * 2 + b // 2) * 16 + c * 4 + (a % 2) * 2 + b % 2
                w[a, b, c, p] = 1.0
    return w


def _pack_conv_weight(dtype_name: str) -> jax.Array:
    return jnp.asarray(_pack_conv_weight_np(), jnp.dtype(dtype_name))


def pack_front_frames_conv(x: jax.Array) -> jax.Array:
    """:func:`pack_front_frames` as ONE stride-4 conv (identity 0/1 taps,
    channel permutation + 16-pad in the weights, plane padding as conv
    input padding, channel-major NCHW output) — 3.24 ms/step at bench
    geometry vs 5.67 for the XLA transpose chain (tools/bench_pack.py);
    exact (0/1 taps accumulate a single term in f32)."""
    B = x.shape[0]
    g = front_geom(x.shape[1], x.shape[2])
    w = _pack_conv_weight(x.dtype.name)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(4, 4),
        padding=((16, 4 * (g.rp - g.c3rows) - 16),
                 (16, 4 * (g.cp - g.cols) - 16)),
        dimension_numbers=("NHWC", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out.reshape(B, 64, g.rp * g.cp)


def pack_front_frames_host(frames: np.ndarray, det_hw) -> np.ndarray:
    """HOST-side letterbox + quarter-grid pack: raw uint8 frames
    (B, H, W, 3) -> letterboxed ``det_hw`` -> packed (B, 64, RP*CP) uint8.

    The packed-input serving path (PipelineConfig.packed_input): the
    reference does its letterbox on the host too (ResizeImg /
    letterbox(auto=False), my_models/detection.py:73-93), and on TPU the
    pack transpose costs ~5.7 ms/step of pure layout work at bench
    geometry — on the host it is a cheap reindex in the decode thread
    pool.  Numpy mirror of :func:`pack_front_frames`; the kernel consumes
    uint8 directly with 1/255 folded into the stem weights
    (``pack_front_weights(input_scale=...)``).
    """
    from lpr_tpu.ops.image import letterbox_geom

    frames = np.asarray(frames)
    assert frames.dtype == np.uint8 and frames.ndim == 4, frames.shape
    B, h, w, _ = frames.shape
    oh, ow = det_hw
    _, (nh, nw), (pl_, pt) = letterbox_geom(h, w, det_hw)
    if (nh, nw) != (h, w):
        try:
            import cv2

            resized = np.stack([
                cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
                for f in frames])
        except ImportError:  # pragma: no cover
            from PIL import Image

            resized = np.stack([
                np.asarray(Image.fromarray(f).resize((nw, nh),
                                                     Image.BILINEAR))
                for f in frames])
    else:
        resized = frames
    lb = np.zeros((B, oh, ow, 3), np.uint8)
    lb[:, pt:pt + nh, pl_:pl_ + nw] = resized
    g = front_geom(oh, ow)
    z = lb.reshape(B, g.c3rows, 2, 2, g.cols, 2, 2, 3)
    z = np.ascontiguousarray(z.transpose(0, 2, 5, 7, 3, 6, 1, 4))
    z = z.reshape(B, 4, 12, g.c3rows, g.cols)
    z = np.pad(z, ((0, 0), (0, 0), (0, 4), (4, g.rp - g.c3rows - 4),
                   (4, g.cp - g.cols - 4)))
    return z.reshape(B, 64, g.rp * g.cp)


def pack_front_input(x_s2d: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 12) s2d plane -> (B, 64, RP*CP) (test convenience;
    production uses :func:`pack_front_frames` on the raw frames)."""
    B = x_s2d.shape[0]
    g = front_geom(x_s2d.shape[1] * 2, x_s2d.shape[2] * 2)
    z = x_s2d.reshape(B, g.c3rows, 2, g.cols, 2, 12)    # b k rho ce pp ch
    z = jnp.transpose(z, (0, 2, 4, 5, 1, 3))     # b rho pp ch k ce
    z = z.reshape(B, 4, 12, g.c3rows, g.cols)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, 4), (4, g.rp - g.c3rows - 4),
                    (4, g.cp - g.cols - 4)))
    return z.reshape(B, 64, g.rp * g.cp)


def _pad16(w2d: np.ndarray) -> np.ndarray:
    """(12, Cout) -> (16, Cout) zero-padded rows."""
    out = np.zeros((16, w2d.shape[1]), w2d.dtype)
    out[:12] = w2d
    return out


def pack_front_weights(p_stem: Dict, p_down: Dict, p_c3: Dict,
                       input_scale: float = 1.0) -> Dict:
    """BN-folded HWIO conv params -> kernel weight dict (bf16 device arrays).

    p_stem: {"w": (3,3,12,32) S2D-TRANSFORMED stem weights, "b": (32,)}
    p_down: {"w": (3,3,32,64), "b": (64,)}
    p_c3:   {"cv1": {w (1,1,64,32), b}, "cv2": {...}, "cv3": {w (1,1,64,64), b},
             "m": [{"cv1": {w (1,1,32,32), b}, "cv2": {w (3,3,32,32), b}}]}
    input_scale: folded into the stem weights — 1/255 lets the kernel
    consume raw uint8 packed frames (the host-packed serving path).
    """
    f32 = np.float32

    def mat(w):  # (1,1,ci,co) -> (co, ci)
        return np.asarray(w, f32)[0, 0].T

    w0 = np.asarray(p_stem["w"], f32) * f32(input_scale)   # (3,3,12,32)
    # K-rows grouped (dr, dx) x 16 padded channels
    w0k = np.concatenate(
        [_pad16(w0[dr, dx]) for dr in range(3) for dx in range(3)], 0
    )                                     # (144, 32)
    w1 = np.asarray(p_down["w"], f32)     # (3,3,32,64)
    w1k = np.concatenate(
        [w1[dr, dx] for dr in range(3) for dx in range(3)], 0
    )                                     # (288, 64)
    m0 = p_c3["m"][0]
    wm2 = np.asarray(m0["cv2"]["w"], f32)
    wm2k = np.concatenate(
        [wm2[dr, dx] for dr in range(3) for dx in range(3)], 0
    )                                     # (288, 32)
    # cv1 (rows 0-31) and cv2 (rows 32-63) fused into one 64x64 matmul
    w12 = np.concatenate([mat(p_c3["cv1"]["w"]), mat(p_c3["cv2"]["w"])], 0)
    b12 = np.concatenate([np.asarray(p_c3["cv1"]["b"], f32),
                          np.asarray(p_c3["cv2"]["b"], f32)], 0)
    bf = jnp.bfloat16

    def dev(a, dt=bf):
        return jnp.asarray(a, dt)

    return {
        "w0": dev(w0k.T),                       # (32, 144)
        "b0": dev(np.asarray(p_stem["b"], f32).reshape(32, 1), jnp.float32),
        "w1": dev(w1k.T),                       # (64, 288)
        "b1": dev(np.asarray(p_down["b"], f32).reshape(64, 1), jnp.float32),
        "w12": dev(w12),                        # (64, 64)
        "b12": dev(b12.reshape(64, 1), jnp.float32),
        "wm1": dev(mat(m0["cv1"]["w"])),        # (32, 32)
        "bm1": dev(np.asarray(m0["cv1"]["b"], f32).reshape(32, 1),
                   jnp.float32),
        "wm2": dev(wm2k.T),                     # (32, 288)
        "bm2": dev(np.asarray(m0["cv2"]["b"], f32).reshape(32, 1),
                   jnp.float32),
        "w3": dev(mat(p_c3["cv3"]["w"])),       # (64, 64)
        "b3": dev(np.asarray(p_c3["cv3"]["b"], f32).reshape(64, 1),
                  jnp.float32),
    }


# (source-plane row-parity, k-shift) / (col-parity, col-shift) tap tables:
# tap m of a 3-tap stride-1/2 window on parity plane delta (see docstring)
_TAP_EVEN = ((1, -1), (0, 0), (1, 0))   # output on even parity
_TAP_ODD = ((0, 0), (1, 0), (0, 1))     # output on odd parity


def _front_kernel(g: FrontGeom, is_u8: bool, x_hbm, w0, b0, w1, b1, w12,
                  b12, wm1, bm1, wm2, bm2, w3, b3, out_ref, xw, xwc, a0,
                  sq, a1, dbuf, p1, a2, cbuf, sem):
    """One (image b, strip s) cell of geometry ``g`` (see module
    docstring).  ``is_u8``: the input window is uint8 (host-packed raw
    frames, /255 folded into w0) and is cast once per cell into the
    ``xwc`` bf16 scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    s = pl.program_id(1)
    bf = jnp.bfloat16

    # zero scratch once: K-pad rows of the im2col buffers and the halo
    # rows of the row-windowed buffers are never written afterwards
    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _():
        for ref in (a0, sq, a2, dbuf, p1):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # ---- double-buffered input DMA: prefetch cell c+1's strip while
    # computing cell c (cells iterate (b, s) with s fastest)
    c = b * g.nstrip + s
    slot = c % 2

    def strip_copy(cell, sl):
        cb = cell // g.nstrip
        cs = cell % g.nstrip
        return pltpu.make_async_copy(
            x_hbm.at[cb, :, pl.ds(g.strip * cs * g.cp, g.win * g.cp)],
            xw.at[sl], sem.at[sl])

    @pl.when(c == 0)
    def _():
        strip_copy(0, 0).start()
    nb = pl.num_programs(0) * g.nstrip

    @pl.when(c + 1 < nb)
    def _():
        strip_copy(c + 1, (c + 1) % 2).start()
    strip_copy(c, slot).wait()
    xw = xw.at[slot]
    if is_u8:
        # Mosaic has no direct u8 -> bf16 cast; hop through int32/f32
        xwc[...] = xw[...].astype(jnp.int32).astype(jnp.float32).astype(bf)
        xw = xwc

    # ---- domain masks (lanes -> (row, col) of each grid)
    def domain_mask(nrows, row0, nvalid, step=1):
        # q in [4, 4+g.cols) and global row row0 + step*r in [0, nvalid)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, nrows * g.cp), 1)
        q = l % g.cp
        t = row0 + step * (l // g.cp)
        return (q >= 4) & (q < 4 + g.cols) & (t >= 0) & (t < nvalid)

    # ---- stem on quarter grids: 4 output planes (rho, pi), 36 aligned
    # plane-shift copies into one (144, 4*g.kq*g.cp) im2col, ONE matmul.
    # Output plane row a (0..KQ) is quarter-row k = g.strip*s + a - 2
    # (s2d row t = 2k + rho).
    W0 = w0[...]
    NQ = g.kq * g.cp
    for rho in (0, 1):
        rtap = _TAP_EVEN if rho == 0 else _TAP_ODD
        for pi in (0, 1):
            ctap = _TAP_EVEN if pi == 0 else _TAP_ODD
            off = (2 * rho + pi) * NQ
            for dr in range(3):
                rs, kd = rtap[dr]
                for dx in range(3):
                    ps, cd = ctap[dx]
                    k = dr * 3 + dx
                    src = 16 * (2 * rs + ps)
                    base = (2 + kd) * g.cp + cd
                    a0[16 * k:16 * k + 12, off:off + NQ] = (
                        xw[src:src + 12, base:base + NQ])
    y4 = jnp.dot(W0, a0[...], preferred_element_type=jnp.float32)
    y4 = _silu_f32(y4 + b0[...])
    for rho in (0, 1):
        for pi in (0, 1):
            off = (2 * rho + pi) * NQ
            ok = domain_mask(g.kq, 2 * (g.strip * s - 2) + rho, g.rows, step=2)
            # plane (rho, pi) lives at sq rows [32*(2rho+pi), +32); plane
            # row a stored at lane (a+1)*g.cp (rows 0 / g.kq+1 are zero halo)
            pr = 32 * (2 * rho + pi)
            sq[pr:pr + 32, g.cp:(g.kq + 1) * g.cp] = (
                jnp.where(ok, y4[:, off:off + NQ], 0.0).astype(bf))

    # ---- down1: sources reduce to plane selection + uniform shifts on
    # the quarter grid, so ONE im2col + ONE matmul covers all g.drows rows
    W1 = w1[...]
    ND = g.drows * g.cp
    for dr in range(3):
        rs, kd = _TAP_EVEN[dr]      # stem row 2*t1 + dr - 1
        for dx in range(3):
            ps, cd = _TAP_EVEN[dx]  # stem col 2*d + dx - 1
            k = dr * 3 + dx
            pr = 32 * (2 * rs + ps)
            base = (2 + kd) * g.cp + cd
            a1[32 * k:32 * k + 32, :] = sq[pr:pr + 32, base:base + ND]
    y = jnp.dot(W1, a1[...], preferred_element_type=jnp.float32)
    y = _silu_f32(y + b1[...])
    ok = domain_mask(g.drows, g.strip * s - 1, g.c3rows)
    dbuf[:, g.cp:(g.drows + 1) * g.cp] = jnp.where(ok, y, 0.0).astype(bf)

    # ---- C3: cv1 (halo rows) + cv2 (center rows) in one matmul
    W12 = w12[...]
    y = jnp.dot(W12, dbuf[:, g.cp:(g.drows + 1) * g.cp],
                preferred_element_type=jnp.float32)
    # y row r <-> down global row g.strip*s + r - 1 (dbuf/p1 row j = r + 1)
    y = _silu_f32(y + b12[...])          # (64, g.drows*g.cp)
    c3_okd = domain_mask(g.drows, g.strip * s - 1, g.c3rows)
    y = jnp.where(c3_okd, y, 0.0)
    p1[0:32, g.cp:(g.drows + 1) * g.cp] = y[0:32].astype(bf)   # cv1 branch
    p2 = y[32:64, g.cp:(g.strip + 1) * g.cp]   # cv2 branch, center g.strip rows

    # m.cv1 on the cv1 branch (g.drows halo rows)
    Wm1 = wm1[...]
    ym1 = jnp.dot(Wm1, p1[0:32, g.cp:(g.drows + 1) * g.cp],
                  preferred_element_type=jnp.float32)
    ym1 = _silu_f32(ym1 + bm1[...])
    p1[32:64, g.cp:(g.drows + 1) * g.cp] = jnp.where(c3_okd, ym1, 0.0).astype(bf)

    # m.cv2 3x3 over the m.cv1 output (stored with leading zero row)
    NC = g.strip * g.cp
    for dr in range(3):
        for dx in range(3):
            k = dr * 3 + dx
            base = (dr + 1) * g.cp + dx - 1
            a2[32 * k:32 * k + 32, :] = p1[32:64, base:base + NC]
    Wm2 = wm2[...]
    ym2 = jnp.dot(Wm2, a2[...], preferred_element_type=jnp.float32)
    ym2 = _silu_f32(ym2 + bm2[...])
    c3_oks = domain_mask(g.strip, g.strip * s, g.c3rows)
    ym2 = jnp.where(c3_oks, ym2, 0.0)
    # shortcut add (c1 == c2): + cv1-branch center rows
    m1 = ym2.astype(bf) + p1[0:32, 2 * g.cp:(g.strip + 2) * g.cp]

    cbuf[0:32, :] = m1
    cbuf[32:64, :] = p2.astype(bf)
    W3 = w3[...]
    yo = jnp.dot(W3, cbuf[...], preferred_element_type=jnp.float32)
    yo = _silu_f32(yo + b3[...])
    yo = jnp.where(c3_oks, yo, 0.0).astype(bf)    # (64, g.strip*g.cp)

    # ---- one aligned block write, CP-padded rows intact (pad cols are
    # zero via the domain mask); XLA strips the pad in the output
    # transpose.  Slicing out the real cols here instead costs ~8
    # lane-unaligned (offset +4, width 320) VMEM copies per cell — the
    # DMA+write floor measured 3.67 ms/step of the 9.1 ms kernel with
    # them (tools/probe_front_stages.py).
    out_ref[0] = yo


@functools.partial(jax.jit, static_argnames=("interpret", "geom"))
def front_fused(xp: jax.Array, w: Dict, interpret: bool = False,
                geom: Optional[FrontGeom] = None) -> jax.Array:
    """xp: packed input (B, 64, RP*CP) — 4 parity planes x 16 padded
    channels (see pack_front_input) — bf16 normalized frames, or uint8
    raw frames when the weights were packed with ``input_scale=1/255``
    (host-packed path).  Returns (B, H/4, W/4, 64) bf16.
    ``geom`` defaults to the production 736x1280 geometry."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = geom or _G0
    assert xp.shape[1:] == (64, g.rp * g.cp), (xp.shape, g)
    is_u8 = xp.dtype == jnp.uint8
    assert is_u8 or xp.dtype == jnp.bfloat16, xp.dtype
    B = xp.shape[0]
    bf = jnp.bfloat16
    grid = (B, g.nstrip)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    out = pl.pallas_call(
        functools.partial(_front_kernel, g, is_u8),
        out_shape=jax.ShapeDtypeStruct((B, 64, g.c3rows * g.cp), bf),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + wspecs,
        out_specs=pl.BlockSpec(
            (1, 64, g.strip * g.cp), lambda b, s: (b, 0, s),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            # xw (double-buffered input windows, input dtype)
            pltpu.VMEM((2, 64, g.win * g.cp), xp.dtype),
            # xwc: u8 -> bf16 cast buffer (token-sized when unused)
            pltpu.VMEM((64, g.win * g.cp) if is_u8 else (16, 128), bf),
            pltpu.VMEM((144, 4 * g.kq * g.cp), bf),    # a0 (4 planes)
            pltpu.VMEM((128, (g.kq + 2) * g.cp), bf),  # sq: 4 stem planes
            pltpu.VMEM((288, g.drows * g.cp), bf),     # a1
            pltpu.VMEM((64, (g.drows + 2) * g.cp), bf),  # dbuf
            pltpu.VMEM((64, (g.drows + 2) * g.cp), bf),  # p1 (halo rows)
            pltpu.VMEM((288, g.strip * g.cp), bf),     # a2
            pltpu.VMEM((64, g.strip * g.cp), bf),      # cbuf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # larger strips need more than the default 16 MB scoped-vmem
        # budget; v5e has 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w["w0"], w["b0"], w["w1"], w["b1"], w["w12"], w["b12"],
      w["wm1"], w["bm1"], w["wm2"], w["bm2"], w["w3"], w["b3"])
    out = out.reshape(B, 64, g.c3rows, g.cp)[:, :, :, 4:4 + g.cols]
    return jnp.transpose(out, (0, 2, 3, 1))


def _fold_conv(p: Dict) -> Dict:
    """Conv param dict (maybe with separate BN) -> {"w", "b"} numpy."""
    w = np.asarray(p["w"], np.float32)
    b = None if p.get("b") is None else np.asarray(p["b"], np.float32)
    if "bn" in p:
        bn = p["bn"]
        w, b = tnn.fuse_conv_bn(w, b, np.asarray(bn["gamma"]),
                                np.asarray(bn["beta"]),
                                np.asarray(bn["mean"]),
                                np.asarray(bn["var"]), eps=1e-3)
    if b is None:
        b = np.zeros((w.shape[-1],), np.float32)
    return {"w": w, "b": b}


def front_pack_from_params(model, params, input_scale: float = 1.0):
    """Match the detector's first three layers against the fused-front
    pattern and return packed kernel weights, or None.

    ``input_scale``: folded into the stem weights (1/255 for the uint8
    host-packed input path).

    Requirements: layer0 = S2D-stem Conv(3->32, k6 s2 p2), layer1 =
    Conv(32->64, k3 s2), layer2 = C3(64->64, n=1, shortcut), sequential
    wiring, and layers 0/1 not consumed elsewhere.  ``params`` must be
    concrete (call at model-load time, not under trace).
    """
    from lpr_tpu.models.yolo import C3, Conv

    ls = model.layers
    if len(ls) < 3:
        return None
    l0, l1, l2 = ls[0], ls[1], ls[2]
    ok = (type(l0) is Conv and l0._is_s2d_stem() and l0.c1 == 3
          and l0.c2 == 32 and l0.act == "silu"
          and type(l1) is Conv and l1.k == 3 and l1.s == 2
          and l1.c1 == 32 and l1.c2 == 64 and l1.g == 1
          and l1.act == "silu"
          and type(l2) is C3 and l2.n == 1 and l2.shortcut
          and l2.c1 == 64 and l2.c2 == 64 and l2.g == 1 and l2.e == 0.5
          and l1.f == -1 and l2.f == -1
          and not ({0, 1} & set(model.save)))
    if not ok:
        return None
    p0 = _fold_conv(params[0])
    # apply the S2D stem weight rearrangement (Conv._is_s2d_stem path)
    w6 = p0["w"]                                  # (6, 6, 3, 32)
    w6 = w6.reshape(3, 2, 3, 2, 3, 32).transpose(0, 2, 4, 1, 3, 5)
    p_stem = {"w": w6.reshape(3, 3, 12, 32), "b": p0["b"]}
    p_down = _fold_conv(params[1])
    c3p = params[2]
    p_c3 = {
        "cv1": _fold_conv(c3p["cv1"]),
        "cv2": _fold_conv(c3p["cv2"]),
        "cv3": _fold_conv(c3p["cv3"]),
        "m": [{"cv1": _fold_conv(c3p["m"][0]["cv1"]),
               "cv2": _fold_conv(c3p["m"][0]["cv2"])}],
    }
    return pack_front_weights(p_stem, p_down, p_c3,
                              input_scale=input_scale)


def front_apply(x: jax.Array, packed: Dict) -> jax.Array:
    """Letterboxed frame batch (B, H, W, 3) bf16 -> C3 output
    (B, H/4, W/4, 64) via the fused kernel (the S2D reshuffle is folded
    into the one packing transpose).  Geometry derived from the frame
    shape (any H % 32 == 0, W % 64 == 0).

    Stays on the XLA transpose pack: the stride-4 MXU conv variant wins
    in isolation (3.24 vs 5.67 ms/step, tools/bench_pack.py) but LOSES
    end-to-end (639 vs 672 fps) — in the pipeline the transpose chain
    fuses with the letterbox pad while the conv forces the letterboxed
    frame + its f32 conv output to materialize."""
    g = front_geom(x.shape[1], x.shape[2])
    return front_fused(pack_front_frames(x), packed, geom=g)


def front_reference(x_s2d: jax.Array, p_stem: Dict, p_down: Dict,
                    p_c3: Dict) -> jax.Array:
    """XLA composition of the same three layers (parity oracle).

    x_s2d: (B, 368, 640, 12) bf16.  Params as in pack_front_weights.
    """
    x = tnn.conv2d(x_s2d, jnp.asarray(p_stem["w"]),
                   jnp.asarray(p_stem["b"]), stride=1, padding=1)
    x = tnn.silu(x)
    x = tnn.conv2d(x, jnp.asarray(p_down["w"]), jnp.asarray(p_down["b"]),
                   stride=2, padding=1)
    x = tnn.silu(x)

    def cv(p, z, k=1):
        return tnn.silu(tnn.conv2d(z, jnp.asarray(p["w"]),
                                   jnp.asarray(p["b"]), padding=k // 2))

    y1 = cv(p_c3["cv1"], x)
    m = p_c3["m"][0]
    y1b = cv(m["cv2"], cv(m["cv1"], y1), k=3) + y1
    y2 = cv(p_c3["cv2"], x)
    return cv(p_c3["cv3"], jnp.concatenate([y1b, y2], -1))
