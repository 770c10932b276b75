"""Fused Pallas kernel for YOLO backbone layers 3-4 (the "mid" stage).

NEGATIVE RESULT — kept for the record, off by default
(``PipelineConfig.fused_mid=False``).  At the bench geometry (736x1280,
batch 32, v5e) this kernel is a net end-to-end LOSS: XLA runs layers 3-4
in ~6.9 ms while the kernel takes ~9.1 ms plus ~6.4 ms for the
NHWC -> quarter-grid repack (e2e 664 -> 594 fps).  The front kernel's win
came from layers XLA handles badly (3-32 channels, sublane-starved); by
layer 3 the 128-channel grid tiles the MXU fine and the fusion saves less
HBM traffic than the repack costs.  A future variant could fold the
repack into the front kernel's output stage and revisit.

Extends the fused front end (:mod:`lpr_tpu.ops.pallas.yolo_front`, layers
0-2) one stage deeper: the stride-2 ``Conv(64->128, k3)`` and the
``C3(128->128, n=2, shortcut)`` block that follow it (yolov5s-v6.0 layers
3-4, reference yolov5/models/common.py:37-49, :126-138).  At the bench
geometry these run on a 184x320x64 -> 92x160x128 grid: 128 output channels
are finally lane-friendly, but in XLA each of the seven convs still
round-trips its activation through HBM; here one VMEM-resident kernel per
(image, 8-row strip) computes all of them.

Layout: same channel-major scheme as the front kernel, one level down.
The front's 184x320x64 output is parity-split in both axes into FOUR
64-channel quarter planes on the 92x160 grid -> a (256, rows*CP) array
(channels/planes on sublanes, row-major spatial on lanes, rows padded +4,
cols padded 4 left / right to CP = 256).  The stride-2 conv's taps then
become (plane select, uniform lane shift) pairs — one im2col + ONE
(128, 576) x (576, 12*CP) matmul per strip — and the C3 convs run on the
same single-plane grid with plain lane-shift taps.

Halo recompute per 8-row strip: the two bottleneck 3x3s need +-2 rows of
C3-input, so the strip computes 12 L3 rows (1.5x) from a 14-half-row input
window — all in VMEM, no inter-cell communication.

The C3 output (layer 4) is both the next backbone input and a saved head
feature (P3 concat), so the kernel emits the full NHWC tensor.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import nn as tnn
from lpr_tpu.ops.pallas.yolo_front import _TAP_EVEN, _fold_conv, _silu_f32


class MidGeom(NamedTuple):
    rows: int     # output rows (H/8)
    cols: int     # output cols (W/8)
    cp: int       # padded plane cols
    strip: int    # output rows per grid cell
    nstrip: int
    l3rows: int   # L3 rows computed per strip (strip + 4 halo)
    m1rows: int   # bottleneck-1 rows (strip + 2)
    win: int      # input half-rows DMA'd per strip
    rp: int       # padded input half-rows


def mid_geom(c3_h: int, c3_w: int, strip: int = 8) -> MidGeom:
    """Geometry below a (c3_h, c3_w) front-output grid (H/4, W/4).  Output
    grid is (c3_h/2, c3_w/2); the last strip may be partially masked."""
    if c3_h % 2 or c3_w % 2 or c3_w % 32:
        raise ValueError(f"mid kernel needs even front grid with "
                         f"W/4 % 32 == 0, got {(c3_h, c3_w)}")
    rows, cols = c3_h // 2, c3_w // 2
    cp = 128 * ((cols + 8 + 127) // 128)
    nstrip = -(-rows // strip)
    # input half-row k stored at buffer row k + 4; strip s DMAs buffer
    # rows [strip*s, +win) (one spare leading row so every L3 im2col base
    # (2+kd)*cp + cd stays non-negative)
    win = strip + 7
    return MidGeom(rows=rows, cols=cols, cp=cp, strip=strip, nstrip=nstrip,
                   l3rows=strip + 4, m1rows=strip + 2, win=win,
                   rp=strip * (nstrip - 1) + win)


def pack_mid_input(y: jax.Array) -> jax.Array:
    """Front output (B, 2R, 2C, 64) NHWC -> (B, 256, RP*CP) quarter-grid
    parity planes: plane channel = (rho*2 + pp)*64 + c where (rho, pp) are
    the row/col parities — plane[(2rho+pp)*64+c, k, ce] = y[2k+rho,
    2ce+pp, c]."""
    B, H, W, C = y.shape
    g = mid_geom(H, W)
    z = y.reshape(B, g.rows, 2, g.cols, 2, C)           # b k rho ce pp c
    z = jnp.transpose(z, (0, 2, 4, 5, 1, 3))            # b rho pp c k ce
    z = z.reshape(B, 4 * C, g.rows, g.cols)
    z = jnp.pad(z, ((0, 0), (0, 0), (4, g.rp - g.rows - 4),
                    (4, g.cp - g.cols - 4)))
    return z.reshape(B, 4 * C, g.rp * g.cp)


def _tap9(w: np.ndarray) -> np.ndarray:
    """(3,3,Ci,Co) HWIO -> (9*Ci, Co) K-rows grouped by (dr, dx)."""
    return np.concatenate(
        [np.asarray(w, np.float32)[dr, dx] for dr in range(3)
         for dx in range(3)], 0)


def pack_mid_weights(p_l3: Dict, p_c3: Dict) -> Dict:
    """BN-folded HWIO params -> kernel weight dict (bf16 device arrays).

    p_l3: {"w": (3,3,64,128), "b": (128,)}
    p_c3: cv1/cv2 (1,1,128,64), cv3 (1,1,128,128),
          m: [{cv1 (1,1,64,64), cv2 (3,3,64,64)}] * 2
    """
    f32 = np.float32

    def mat(w):  # (1,1,ci,co) -> (co, ci)
        return np.asarray(w, f32)[0, 0].T

    def vec(b, n):
        return jnp.asarray(np.asarray(b, f32).reshape(n, 1), jnp.float32)

    bf = jnp.bfloat16
    m0, m1 = p_c3["m"][0], p_c3["m"][1]
    # cv1 (rows 0-63) and cv2 (rows 64-127) fused into one 128x128 matmul
    w12 = np.concatenate([mat(p_c3["cv1"]["w"]), mat(p_c3["cv2"]["w"])], 0)
    b12 = np.concatenate([np.asarray(p_c3["cv1"]["b"], f32),
                          np.asarray(p_c3["cv2"]["b"], f32)], 0)
    return {
        "w3": jnp.asarray(_tap9(p_l3["w"]).T, bf),        # (128, 576)
        "b3": vec(p_l3["b"], 128),
        "w12": jnp.asarray(w12, bf),                      # (128, 128)
        "b12": vec(b12, 128),
        "wa1": jnp.asarray(mat(m0["cv1"]["w"]), bf),      # (64, 64)
        "ba1": vec(m0["cv1"]["b"], 64),
        "wa2": jnp.asarray(_tap9(m0["cv2"]["w"]).T, bf),  # (64, 576)
        "ba2": vec(m0["cv2"]["b"], 64),
        "wb1": jnp.asarray(mat(m1["cv1"]["w"]), bf),
        "bb1": vec(m1["cv1"]["b"], 64),
        "wb2": jnp.asarray(_tap9(m1["cv2"]["w"]).T, bf),
        "bb2": vec(m1["cv2"]["b"], 64),
        "w3o": jnp.asarray(mat(p_c3["cv3"]["w"]), bf),    # (128, 128)
        "b3o": vec(p_c3["cv3"]["b"], 128),
    }


def _mid_kernel(g: MidGeom, x_hbm, w3, b3, w12, b12, wa1, ba1, wa2, ba2,
                wb1, bb1, wb2, bb2, w3o, b3o, out_ref, xw, a3, l3buf,
                ybuf, am, mb, sem):
    """One (image b, strip s) cell (see module docstring).

    Row bookkeeping: L3 rows t2 in [S-2, S+g.strip+2) live at buffer row
    j = t2 - S + 2 (S = g.strip*s); bottleneck-1 rows [S-1, S+g.strip+1)
    at j - 1; output rows [S, S+g.strip)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    s = pl.program_id(1)
    bf = jnp.bfloat16

    @pl.when(jnp.logical_and(b == 0, s == 0))
    def _():
        for ref in (a3, am, ybuf, mb):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # double-buffered input DMA (cells iterate (b, s), s fastest)
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

    def domain_mask(nrows, row0):
        l = jax.lax.broadcasted_iota(jnp.int32, (1, nrows * g.cp), 1)
        q = l % g.cp
        t = row0 + l // g.cp
        return (q >= 4) & (q < 4 + g.cols) & (t >= 0) & (t < g.rows)

    S = g.strip * s
    NL = g.l3rows * g.cp

    # ---- L3 stride-2 conv: plane-select + uniform-shift im2col, ONE
    # matmul for all g.l3rows rows.  L3 row t2 (local j = t2 - S + 2, t2
    # in [S-2, S+g.strip+2)) taps front row 2*t2 + dr - 1 = plane rs,
    # half row t2 + kd; the window starts at half row S - 4, so tap local
    # row = j + kd + 2 and base = (2+kd)*cp + cd >= 0.
    for dr in range(3):
        rs, kd = _TAP_EVEN[dr]
        for dx in range(3):
            ps, cd = _TAP_EVEN[dx]
            k = dr * 3 + dx
            pr = 64 * (2 * rs + ps)
            base = (2 + kd) * g.cp + cd
            a3[64 * k:64 * k + 64, :] = xw[pr:pr + 64, base:base + NL]
    y3 = jnp.dot(w3[...], a3[...], preferred_element_type=jnp.float32)
    ok_l3 = domain_mask(g.l3rows, S - 2)
    l3buf[...] = jnp.where(ok_l3, _silu_f32(y3 + b3[...]), 0.0).astype(bf)

    # ---- C3 cv1 (rows 0-63) + cv2 (rows 64-127) in one matmul over the
    # full l3 window (cv2 only needs the center rows; masking keeps the
    # extras zero)
    y12 = jnp.dot(w12[...], l3buf[...], preferred_element_type=jnp.float32)
    y12 = jnp.where(ok_l3, _silu_f32(y12 + b12[...]), 0.0)
    ybuf[...] = y12.astype(bf)   # rows 0-63 cv1 out, 64-127 cv2 out

    def bottleneck(w1, b1, w2, b2, nrows_in, row0_in):
        """m.cv1 1x1 + m.cv2 3x3 + residual.  Input: mb[0:64, :ni] holds
        nrows_in rows representing [row0_in, +nrows_in).  Output:
        nrows_in - 2 rows representing [row0_in + 1, +nrows_in - 2)
        (one halo row shed each side), returned as bf16.

        The m.cv1 result is stored at a +1-row offset behind a permanently
        zero leading row so every im2col base (dr+1)*cp + dx - 1 is
        non-negative; the single lane each (dr=2, dx=2) row reads past the
        written region feeds only the masked final pad column."""
        ni = nrows_in * g.cp
        yi = jnp.dot(w1[...], mb[0:64, :ni],
                     preferred_element_type=jnp.float32)
        oki = domain_mask(nrows_in, row0_in)
        mb[64:128, g.cp:g.cp + ni] = jnp.where(
            oki, _silu_f32(yi + b1[...]), 0.0).astype(bf)
        nrows_out = nrows_in - 2
        no = nrows_out * g.cp
        # output local row o (global row0_in + 1 + o) taps m.cv1 local
        # rows (o + dr), stored at offset (o + dr + 1) * cp
        for dr in range(3):
            for dx in range(3):
                k = dr * 3 + dx
                base = (dr + 1) * g.cp + dx - 1
                am[64 * k:64 * k + 64, :no] = mb[64:128, base:base + no]
        yo = jnp.dot(w2[...], am[:, :no],
                     preferred_element_type=jnp.float32)
        oko = domain_mask(nrows_out, row0_in + 1)
        yo = jnp.where(oko, _silu_f32(yo + b2[...]), 0.0)
        # shortcut (c1 == c2): + input rows [row0_in + 1, +nrows_out)
        return yo.astype(bf) + mb[0:64, g.cp:g.cp + no]

    # bottleneck 1: cv1 rows [S-2, S+strip+2) -> rows [S-1, S+strip+1)
    mb[0:64, :g.l3rows * g.cp] = ybuf[0:64, :g.l3rows * g.cp]
    r1 = bottleneck(wa1, ba1, wa2, ba2, g.l3rows, S - 2)
    # bottleneck 2: r1 rows -> center strip rows [S, S+strip)
    mb[0:64, :g.m1rows * g.cp] = r1
    r2 = bottleneck(wb1, bb1, wb2, bb2, g.m1rows, S - 1)

    NS = g.strip * g.cp
    # concat [m2 out, cv2 center rows] -> cv3 (staged in a3, NOT mb: the
    # mb[64:128] leading row must stay zero across cells)
    a3[0:64, :NS] = r2
    a3[64:128, :NS] = ybuf[64:128, 2 * g.cp:2 * g.cp + NS]
    yo = jnp.dot(w3o[...], a3[0:128, :NS],
                 preferred_element_type=jnp.float32)
    ok = domain_mask(g.strip, S)
    yo = jnp.where(ok, _silu_f32(yo + b3o[...]), 0.0).astype(bf)

    for u in range(g.strip):
        out_ref[0, :, u * g.cols:(u + 1) * g.cols] = (
            yo[:, u * g.cp + 4:u * g.cp + 4 + g.cols])


@functools.partial(jax.jit, static_argnames=("interpret", "geom"))
def mid_fused(xp: jax.Array, w: Dict, geom: MidGeom,
              interpret: bool = False) -> jax.Array:
    """xp: packed front output (B, 256, RP*CP) from pack_mid_input.
    Returns (B, rows, cols, 128) bf16 (layer-4 output)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = geom
    assert xp.shape[1:] == (256, g.rp * g.cp), (xp.shape, g)
    B = xp.shape[0]
    bf = jnp.bfloat16
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14
    out = pl.pallas_call(
        functools.partial(_mid_kernel, g),
        out_shape=jax.ShapeDtypeStruct((B, 128, g.rows * g.cols), bf),
        grid=(B, g.nstrip),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + wspecs,
        out_specs=pl.BlockSpec(
            (1, 128, g.strip * g.cols),
            lambda b, s: (b, 0, s), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 256, g.win * g.cp), bf),      # xw
            pltpu.VMEM((576, g.l3rows * g.cp), bf),      # a3
            pltpu.VMEM((128, g.l3rows * g.cp), bf),      # l3buf
            pltpu.VMEM((128, g.l3rows * g.cp), bf),      # ybuf (cv1/cv2)
            pltpu.VMEM((576, g.m1rows * g.cp), bf),      # am
            pltpu.VMEM((128, (g.l3rows + 2) * g.cp), bf),  # mb work pair
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w["w3"], w["b3"], w["w12"], w["b12"], w["wa1"], w["ba1"],
      w["wa2"], w["ba2"], w["wb1"], w["bb1"], w["wb2"], w["bb2"],
      w["w3o"], w["b3o"])
    out = out.reshape(B, 128, g.rows, g.cols)
    return jnp.transpose(out, (0, 2, 3, 1))


def mid_pack_from_params(model, params) -> Optional[Dict]:
    """Match detector layers 3-4 against Conv(64->128, k3, s2) +
    C3(128->128, n=2, shortcut) and return packed weights, or None.
    Layer 3 must not be a saved head feature (layer 4 may be — the kernel
    emits its full output)."""
    from lpr_tpu.models.yolo import C3, Conv

    ls = model.layers
    if len(ls) < 5:
        return None
    l3, l4 = ls[3], ls[4]
    ok = (type(l3) is Conv and l3.k == 3 and l3.s == 2 and l3.c1 == 64
          and l3.c2 == 128 and l3.g == 1 and l3.act == "silu"
          and type(l4) is C3 and l4.n == 2 and l4.shortcut
          and l4.c1 == 128 and l4.c2 == 128 and l4.g == 1 and l4.e == 0.5
          and l3.f == -1 and l4.f == -1 and 3 not in model.save)
    if not ok:
        return None
    p_l3 = _fold_conv(params[3])
    c3p = params[4]
    p_c3 = {
        "cv1": _fold_conv(c3p["cv1"]),
        "cv2": _fold_conv(c3p["cv2"]),
        "cv3": _fold_conv(c3p["cv3"]),
        "m": [{"cv1": _fold_conv(mp["cv1"]), "cv2": _fold_conv(mp["cv2"])}
              for mp in c3p["m"]],
    }
    return pack_mid_weights(p_l3, p_c3)


def mid_apply(y: jax.Array, packed: Dict) -> jax.Array:
    """Front output (B, H/4, W/4, 64) bf16 -> layer-4 output
    (B, H/8, W/8, 128) via the fused kernel."""
    g = mid_geom(y.shape[1], y.shape[2])
    return mid_fused(pack_mid_input(y), packed, geom=g)


def mid_reference(y: jax.Array, p_l3: Dict, p_c3: Dict) -> jax.Array:
    """XLA composition of layers 3-4 (parity oracle)."""
    x = tnn.conv2d(y, jnp.asarray(p_l3["w"]), jnp.asarray(p_l3["b"]),
                   stride=2, padding=1)
    x = tnn.silu(x)

    def cv(p, z, k=1):
        return tnn.silu(tnn.conv2d(z, jnp.asarray(p["w"]),
                                   jnp.asarray(p["b"]), padding=k // 2))

    y1 = cv(p_c3["cv1"], x)
    for mp in p_c3["m"]:
        y1 = cv(mp["cv2"], cv(mp["cv1"], y1), k=3) + y1
    y2 = cv(p_c3["cv2"], x)
    return cv(p_c3["cv3"], jnp.concatenate([y1, y2], -1))
