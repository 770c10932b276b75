"""Fused LPSR forward as a single Pallas TPU kernel.

The LPSR enhancer is ~70 small convolutions over a tiny (32, 192) extent.
As individual XLA ops each conv round-trips HBM and pads its 12-96 channel
dims onto 128-lane tiles, yielding ~2% MXU utilization.  This kernel runs
the ENTIRE network for one image per grid cell with every activation and all
0.5 MB of weights resident in VMEM: convs become shift+matmul chains feeding
the MXU back-to-back with zero HBM traffic between layers.

Grid: one program per block of images (bf16 activations keep a 4-image
block in VMEM).  All weights are broadcast VMEM operands.

Semantics identical to :func:`lpr_tpu.models.lpsr.lpsr_apply` (the quirky
reference graph of my_models/lpsr.py — shared CSAR, CA squaring, etc.), and
tested against it.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lpr_tpu.models.lpsr import LPSRConfig


def flatten_lpsr_params(params) -> List[jax.Array]:
    """Flatten the LPSR params dict into the kernel's positional order."""
    flat, _ = jax.tree_util.tree_flatten(params)
    return flat


def _unflatten(treedef, leaves):
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# in-kernel layer math (single image (H, W, C), values not refs)


def _conv2d_k(x, w, b=None, acc_dtype=jnp.float32):
    """kxk same-pad conv via k^2 shifted matmuls (MXU); x (B, H, W, Cin)."""
    B, H, W, Cin = x.shape
    kh, kw = w.shape[0], w.shape[1]
    Cout = w.shape[3]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = jnp.zeros((B * H * W, Cout), acc_dtype)
    for dy in range(kh):
        for dx in range(kw):
            tile = xp[:, dy : dy + H, dx : dx + W, :].reshape(B * H * W, Cin)
            acc = acc + jnp.dot(tile, w[dy, dx],
                                preferred_element_type=acc_dtype)
    out = acc.reshape(B, H, W, Cout)
    if b is not None:
        out = out + b.astype(acc_dtype)
    return out.astype(x.dtype)


def _dwconv5(x, w, b):
    """Depthwise 5x5 same-pad (VPU shifts; w (5,5,1,C)); x (B, H, W, C)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    acc = jnp.zeros((B, H, W, C), jnp.float32)
    for dy in range(5):
        for dx in range(5):
            acc = acc + xp[:, dy : dy + H, dx : dx + W, :].astype(jnp.float32) \
                * w[dy, dx, 0].astype(jnp.float32)
    return (acc + b.astype(jnp.float32)).astype(x.dtype)


def _relu(x):
    return jnp.maximum(x, 0)


def _deint2(x, axis):
    """Even/odd split along a spatial axis of (B, H, W, C) — expressed as
    major-dim reshapes (+ transposes for the W axis) so Mosaic never sees
    a lane-dim shape cast or a gather.  axis: 0=H, 1=W."""
    B, H, W, C = x.shape
    if axis == 0:
        xr = x.reshape(B, H // 2, 2, W, C)
        return xr[:, :, 0], xr[:, :, 1]
    xt = x.transpose(0, 2, 1, 3).reshape(B, W // 2, 2, H, C)
    return (xt[:, :, 0].transpose(0, 2, 1, 3),
            xt[:, :, 1].transpose(0, 2, 1, 3))


def _int2(p0, p1, axis):
    """Interleave two (B, H, W, C) arrays along a spatial axis (inverse of
    :func:`_deint2`)."""
    B, H, W, C = p0.shape
    if axis == 0:
        return jnp.stack([p0, p1], axis=2).reshape(B, 2 * H, W, C)
    s = jnp.stack(
        [p0.transpose(0, 2, 1, 3), p1.transpose(0, 2, 1, 3)], axis=2
    )
    return s.reshape(B, 2 * W, H, C).transpose(0, 2, 1, 3)


def _pixel_unshuffle(x, r):
    """Space-to-depth in *k-major* channel order (k = i*2+j blocks of C);
    the consuming weights are permuted from torch order by
    :func:`_permute_focus_order` at call time.  x (B, H, W, C)."""
    assert r == 2
    top, bot = _deint2(x, 0)       # even/odd rows
    p00, p01 = _deint2(top, 1)     # (i=0, j=0/1)
    p10, p11 = _deint2(bot, 1)
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)


def _pixel_shuffle(x, r):
    """Depth-to-space consuming k-major channel blocks (see above)."""
    assert r == 2
    C = x.shape[-1]
    co = C // 4
    p00 = x[..., 0 * co : 1 * co]
    p01 = x[..., 1 * co : 2 * co]
    p10 = x[..., 2 * co : 3 * co]
    p11 = x[..., 3 * co : 4 * co]
    top = _int2(p00, p01, 1)
    bot = _int2(p10, p11, 1)
    return _int2(top, bot, 0)


def _forward_block(p, x, cfg: LPSRConfig):
    """LPSR forward for a block of images (B, H, W, 3) using plain jnp
    inside the kernel; mirrors lpr_tpu.models.lpsr semantics exactly."""
    ae = p["auto_encoder"]
    conv_in = _conv2d_k(x, ae["conv_in"]["w"])
    y = _dwconv5(conv_in, ae["enc0"]["dw"]["w"], ae["enc0"]["dw"]["b"])
    y = _conv2d_k(y, ae["enc0"]["pw"]["w"], ae["enc0"]["pw"]["b"])
    y = _relu(_pixel_unshuffle(y, 2))
    y = _dwconv5(y, ae["enc1"]["dw"]["w"], ae["enc1"]["dw"]["b"])
    y = _conv2d_k(y, ae["enc1"]["pw"]["w"], ae["enc1"]["pw"]["b"])
    y = _relu(_pixel_unshuffle(y, 2))
    y = _dwconv5(y, ae["dec0"]["dw"]["w"], ae["dec0"]["dw"]["b"])
    y = _conv2d_k(y, ae["dec0"]["pw"]["w"], ae["dec0"]["pw"]["b"])
    y = _relu(_pixel_shuffle(y, 2))
    y = _dwconv5(y, ae["dec1"]["dw"]["w"], ae["dec1"]["dw"]["b"])
    y = _conv2d_k(y, ae["dec1"]["pw"]["w"], ae["dec1"]["pw"]["b"])
    y = _relu(_pixel_shuffle(y, 2))
    y = conv_in + y
    x = _conv2d_k(y, ae["conv_out"]["w"])

    r = p["rdn"]
    sfe1 = _conv2d_k(x, r["shallowF1"]["w"], r["shallowF1"]["b"])
    sfe2 = _conv2d_k(sfe1, r["shallowF2"]["w"], r["shallowF2"]["b"])

    def rdb(bp, z):
        y = z
        for lp in bp["layers"]:
            y = jnp.concatenate([y, _relu(_conv2d_k(y, lp["w"], lp["b"]))], -1)
        # alpha is folded into the lff weights host-side (Mosaic has a
        # scalar-broadcast-into-bf16 verification bug)
        lff = _conv2d_k(y, bp["lff"]["w"], bp["lff"]["b"])
        return z + lff

    def csar(cp, z):
        x_in = _conv2d_k(_relu(_conv2d_k(z, cp["conv_in0"]["w"],
                                         cp["conv_in0"]["b"])),
                         cp["conv_in1"]["w"], cp["conv_in1"]["b"])
        ca = jnp.mean(x_in.astype(jnp.float32), axis=(1, 2))  # (B, C)
        ca = jnp.dot(ca, cp["ca_fc1"]["w"].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + cp["ca_fc1"]["b"]
        ca = jnp.maximum(ca, 0)
        ca = jnp.dot(ca, cp["ca_fc2"]["w"].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + cp["ca_fc2"]["b"]
        ca = jax.nn.sigmoid(ca)  # (B, C) f32
        # Mosaic can't reshape (B, C) -> (B, 1, 1, C); broadcast_in_dim works
        ca_full = jax.lax.broadcast_in_dim(ca, x_in.shape, (0, 3))
        x_ca = (x_in.astype(jnp.float32) * ca_full).astype(x_in.dtype)
        sa_logits = _conv2d_k(
            _relu(_conv2d_k(x_in, cp["sa_conv1"]["w"], cp["sa_conv1"]["b"])),
            cp["sa_conv2"]["w"], cp["sa_conv2"]["b"],
        )
        # sigmoid in f32: lax.logistic on bf16 trips a Mosaic broadcast bug
        sa = jax.nn.sigmoid(sa_logits.astype(jnp.float32)).astype(x_in.dtype)
        y = jnp.concatenate([x_in * x_ca, x_in * sa], -1)
        return z + _conv2d_k(y, cp["conv_out"]["w"], cp["conv_out"]["b"])

    z = sfe2
    feats = []
    for i in range(cfg.num_blocks):
        z = rdb(r["rdbs"][i // 2], z) if i % 2 == 0 else csar(r["csar"], z)
        feats.append(z)
    z = jnp.concatenate(feats, -1)
    z = _conv2d_k(_conv2d_k(z, r["gff0"]["w"], r["gff0"]["b"]),
                  r["gff1"]["w"], r["gff1"]["b"]) + sfe1
    out = _conv2d_k(z, p["final_conv"]["w"], p["final_conv"]["b"])
    return jax.nn.sigmoid(out.astype(jnp.float32))


def _permute_focus_order(params):
    """Permute AutoEncoder weights between torch PixelUnshuffle channel order
    (t = c*4 + k) and the kernel's k-major order (f = k*C + c).

    - unshuffle consumers (enc1, dec0): permute dw w/b channels and pw input
      channels.
    - shuffle producers (dec0.pw, dec1.pw): permute pw output channels + bias.
    """
    ae = params["auto_encoder"]
    e = ae["enc0"]["pw"]["w"].shape[-1]  # expansion channels (12)
    n = 4 * e
    perm = np.asarray([(f % e) * 4 + f // e for f in range(n)])

    def pc(a, axis):
        return jnp.take(jnp.asarray(a), jnp.asarray(perm), axis=axis)

    ae = dict(ae)
    for name in ("enc1", "dec0"):
        blk = {k: dict(v) for k, v in ae[name].items()}
        blk["dw"]["w"] = pc(ae[name]["dw"]["w"], 3)
        blk["dw"]["b"] = pc(ae[name]["dw"]["b"], 0)
        blk["pw"] = dict(blk["pw"], w=pc(ae[name]["pw"]["w"], 2))
        ae[name] = blk
    for name in ("dec0", "dec1"):
        # (dec0's input side was already permuted by the loop above)
        blk = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in ae[name].items()}
        blk["pw"] = dict(
            blk["pw"],
            w=pc(blk["pw"]["w"], 3),
            b=pc(blk["pw"]["b"], 0),
        )
        ae[name] = blk
    return dict(params, auto_encoder=ae)


def lpsr_pallas(params, x: jax.Array, cfg: LPSRConfig = LPSRConfig(),
                interpret: bool = False) -> jax.Array:
    """Fused LPSR forward: x (B, H, W, 3) -> (B, H, W, out_channels).

    H, W must be multiples of 4 (the production 32x192 is).  Falls back to
    interpreter mode off-TPU for testing.
    """
    B, H, W, _ = x.shape
    assert H % 4 == 0 and W % 4 == 0, "pad input to multiples of 4 first"
    params = _permute_focus_order(params)
    # fold the RDB residual scale alpha into the lff conv weights
    rdn = dict(params["rdn"])
    rdn["rdbs"] = [
        dict(bp, lff={"w": bp["lff"]["w"] * bp["alpha"],
                      "b": bp["lff"]["b"] * bp["alpha"]})
        for bp in rdn["rdbs"]
    ]
    params = dict(params, rdn=rdn)
    flat, treedef = jax.tree_util.tree_flatten(params)
    # scalars (the RDB alpha gains) ride as (1, 1) SMEM-friendly arrays
    is_scalar = [np.ndim(l) == 0 for l in flat]
    flat = [jnp.reshape(l, (1, 1)) if s else l
            for l, s in zip(flat, is_scalar)]

    # Block several images per program so every conv matmul has B*H*W rows
    # feeding the MXU; one image would serialize ~70 tiny dots per program.
    # bf16 activations keep the block inside VMEM.
    x = x.astype(jnp.bfloat16)
    blk = 2
    while B % blk:
        blk //= 2
    pb = B // blk

    def kernel(x_ref, *refs):
        w_refs = refs[:-1]
        o_ref = refs[-1]
        leaves = [
            r[0, 0] if s else r[:]
            for r, s in zip(w_refs, is_scalar)
        ]
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        o_ref[:] = _forward_block(p, x_ref[:], cfg).astype(o_ref.dtype)

    out_shape = jax.ShapeDtypeStruct((B, H, W, cfg.out_channels), jnp.float32)
    in_specs = [
        pl.BlockSpec((blk, H, W, 3), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
    return pl.pallas_call(
        kernel,
        grid=(pb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk, H, W, cfg.out_channels),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(x, *flat)
