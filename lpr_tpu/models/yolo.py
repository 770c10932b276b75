"""YOLOv5-family detector, TPU-native.

A declarative spec -> functional graph builder with the same architecture
grammar as the reference's yaml-driven ``parse_model``
(``yolov5/models/yolo.py:243-294``): rows of ``[from, number, module, args]``
with depth/width multiples and ``from``-index wiring.  Unlike the reference
(which builds an ``nn.Sequential`` of stateful modules), the builder here
produces a static layer plan executed as a pure function over a params
pytree — fully jittable, NHWC, bf16-ready.

Covered module zoo (reference ``yolov5/models/common.py:37-275``): Conv,
DWConv, Focus, Bottleneck, BottleneckCSP, C3, C3TR (transformer), C3SPP,
C3Ghost, GhostConv, GhostBottleneck, SPP, SPPF, Concat, Contract, Expand,
nn.Upsample — plus the Detect head with fused decode
(``yolov5/models/yolo.py:33-81``).

Two concrete production architectures (SURVEY.md §2.3):
- plate detector: 3-scale yolov5s-v6.0, nc=11, 1280x1280 -> (100800, 16)
- char OCR:      single-scale stride-8 Focus/SPP/C3TR variant, nc=36,
                 2 evolved anchors, 128x128 -> (512, 41)

Weight import maps pickled-Model state dicts (via
``lpr_tpu.weights.torch_ckpt``) with optional conv+BN fusing (the reference
fuses at load: ``yolov5/models/experimental.py:90-99``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import nn as tnn
from lpr_tpu.weights import convert as cvt

Params = Any


S2D_DOWNSAMPLERS = False  # see Conv._is_s2d_down


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


# ---------------------------------------------------------------------------
# shared conv(+BN)+act building block


def _init_conv(key, k, c1, c2, groups=1, bias=False, bn=True):
    fan_in = max(c1 // groups * k * k, 1)
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.uniform(k1, (k, k, c1 // groups, c2), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (c2,), jnp.float32, -bound, bound)
    if bn:
        p["bn"] = {
            "gamma": jnp.ones((c2,), jnp.float32),
            "beta": jnp.zeros((c2,), jnp.float32),
            "mean": jnp.zeros((c2,), jnp.float32),
            "var": jnp.ones((c2,), jnp.float32),
        }
    return p


# Training-mode BN context: when set (a dict), convs normalize with batch
# statistics and record them keyed by the identity of their bn param dict;
# YoloModel.apply(train=True) folds the EMA'd running stats back into a new
# params pytree.  Cross-replica stats (the reference's SyncBN,
# train.py:217-220) come free under jit sharding: the batch axis is global,
# so jnp.mean over it lowers to a psum across the mesh.
_BN_CTX = [None]
_BN_MOMENTUM = 0.03  # torch YOLO BatchNorm2d momentum (torch_utils.py:51)
_BN_EPS = 1e-3


def _conv(p, x, *, k, stride=1, pad=None, groups=1, act="silu"):
    """Conv(+BN)+act — reference Conv (common.py:37-49).

    When ``p`` carries int8-quantized weights (``w_q``/``w_s``, produced by
    :func:`quantize_yolo`; BN pre-folded) the conv runs on the int8 MXU
    path (:func:`lpr_tpu.ops.nn.conv2d_int8`)."""
    padding = k // 2 if pad is None else pad
    if "w_q" in p:
        y = tnn.conv2d_int8(x, p["w_q"], p["w_s"], p.get("b"),
                            stride=stride, padding=padding, groups=groups)
        if act == "silu":
            return tnn.silu(y)
        if act == "leaky":
            return tnn.leaky_relu(y, 0.1)
        return y
    y = tnn.conv2d(x, p["w"], p.get("b"), stride=stride, padding=padding, groups=groups)
    if "bn" in p:
        bn = p["bn"]
        ctx = _BN_CTX[0]
        if ctx is not None:
            mean = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
            var = jnp.var(y.astype(jnp.float32), axis=(0, 1, 2))
            ctx[id(bn)] = (mean, var)
            scale = bn["gamma"] * jax.lax.rsqrt(var + _BN_EPS)
            y = y * scale.astype(y.dtype) + (
                bn["beta"] - mean * scale
            ).astype(y.dtype)
        else:
            y = tnn.batch_norm(y, bn["gamma"], bn["beta"], bn["mean"],
                               bn["var"], eps=_BN_EPS)
    if act == "silu":
        y = tnn.silu(y)
    elif act == "leaky":
        y = tnn.leaky_relu(y, 0.1)
    return y


def _import_conv(sd, prefix, fuse=True, dw=False):
    w = cvt.conv_w(sd[f"{prefix}.conv.weight"])
    if f"{prefix}.bn.weight" in sd:
        if fuse:
            w, b = tnn.fuse_conv_bn(
                w, None,
                sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
                sd[f"{prefix}.bn.running_mean"], sd[f"{prefix}.bn.running_var"],
            )
            return {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        return {
            "w": jnp.asarray(w),
            "bn": {
                "gamma": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.weight"])),
                "beta": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.bias"])),
                "mean": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.running_mean"])),
                "var": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.running_var"])),
            },
        }
    p = {"w": jnp.asarray(w)}
    if f"{prefix}.conv.bias" in sd:
        p["b"] = jnp.asarray(cvt.vec(sd[f"{prefix}.conv.bias"]))
    return p


# ---------------------------------------------------------------------------
# layers


@dataclasses.dataclass
class Layer:
    """One node in the layer plan (set by the builder: i, f, c2)."""

    def __post_init__(self):
        self.i = 0
        self.f: Union[int, List[int]] = -1

    def init(self, key) -> Params:
        return {}

    def import_torch(self, sd, prefix, fuse=True) -> Params:
        return {}

    def __call__(self, p: Params, x):
        raise NotImplementedError


@dataclasses.dataclass
class Conv(Layer):
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    pad: Optional[int] = None
    g: int = 1
    act: str = "silu"

    def init(self, key):
        return _init_conv(key, self.k, self.c1, self.c2, self.g)

    def import_torch(self, sd, prefix, fuse=True):
        return _import_conv(sd, prefix, fuse)

    def _is_s2d_stem(self):
        """The v6.0 stem Conv(6, s=2, p=2) is exactly equivalent to
        space-to-depth(2) + Conv(3, s=1, p=1) with rearranged weights:
        out = sum_{2a+i, 2b+j, c} z[y+a-1, x+b-1, (c,i,j)] W[2a+i, 2b+j, c].
        The transformed conv sees 4x the input channels at 1/4 the spatial
        positions — far better MXU utilization for the 3-channel stem."""
        return self.k == 6 and self.s == 2 and self.pad == 2 and self.g == 1

    def _is_s2d_down(self):
        """Small-channel Conv(3, s=2, p=1) downsamplers likewise transform to
        space-to-depth(2) + Conv(2, s=1, pad=(1,0)): source taps dh in
        {0,1,2} map to (block a, parity i) = (0,1), (1,0), (1,1); the (0,0)
        tap has zero weight.  Worth it only while Cin is lane-starved."""
        # Measured neutral-to-negative on v5e (the k=2 asymmetric-pad conv
        # lowers worse than the native 3x3/s2), so disabled by default;
        # the transform itself is exact and unit-tested.
        return (S2D_DOWNSAMPLERS
                and self.k == 3 and self.s == 2 and self.pad in (None, 1)
                and self.g == 1 and self.c1 <= 64)

    @staticmethod
    def _s2d_down_weights(w):
        """(3,3,Cin,Cout) -> (2,2,4*Cin,Cout) per the tap mapping above."""
        kh, kw, c1, c2 = w.shape
        w2 = jnp.zeros((2, 2, c1, 2, 2, c2), w.dtype)  # a b c i j o
        tap = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
        for (a, i), dh in tap.items():
            for (b, j), dw in tap.items():
                w2 = w2.at[a, b, :, i, j, :].set(w[dh, dw])
        return w2.reshape(2, 2, c1 * 4, c2)

    def __call__(self, p, x):
        if self._is_s2d_stem():
            w = p["w"]  # (6, 6, c1, c2)
            c1, c2 = w.shape[2], w.shape[3]
            # W'[a, b, c*4 + i*2 + j] = W[2a+i, 2b+j, c]
            w = w.reshape(3, 2, 3, 2, c1, c2)        # a i b j c o
            w = w.transpose(0, 2, 4, 1, 3, 5)        # a b c i j o
            w = w.reshape(3, 3, c1 * 4, c2)
            z = tnn.pixel_unshuffle(x, 2)
            p2 = dict(p, w=w)
            return _conv(p2, z, k=3, stride=1, pad=1, act=self.act)
        if self._is_s2d_down():
            z = tnn.pixel_unshuffle(x, 2)
            p2 = dict(p, w=self._s2d_down_weights(p["w"]))
            return _conv(p2, z, k=2, stride=1, pad=((1, 0), (1, 0)),
                         act=self.act)
        return _conv(p, x, k=self.k, stride=self.s, pad=self.pad,
                     groups=self.g, act=self.act)


@dataclasses.dataclass
class DWConv(Conv):
    """Depthwise conv (common.py:52-55): groups = gcd(c1, c2)."""

    def __post_init__(self):
        super().__post_init__()
        self.g = math.gcd(self.c1, self.c2)


@dataclasses.dataclass
class Focus(Layer):
    """Space-to-depth 2x2 + Conv (common.py:199-207)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1

    def init(self, key):
        return _init_conv(key, self.k, self.c1 * 4, self.c2)

    def import_torch(self, sd, prefix, fuse=True):
        return _import_conv(sd, f"{prefix}.conv", fuse)

    def __call__(self, p, x):
        return _conv(p, tnn.space_to_depth_focus(x), k=self.k, stride=self.s)


def _bottleneck_init(key, c1, c2, g=1, e=0.5):
    c_ = int(c2 * e)
    k1, k2 = jax.random.split(key)
    return {"cv1": _init_conv(k1, 1, c1, c_), "cv2": _init_conv(k2, 3, c_, c2, g)}


def _bottleneck_import(sd, prefix, fuse):
    return {"cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
            "cv2": _import_conv(sd, f"{prefix}.cv2", fuse)}


def _bottleneck(p, x, *, shortcut, g=1):
    """Standard bottleneck (common.py:94-104)."""
    y = _conv(p["cv2"], _conv(p["cv1"], x, k=1), k=3, groups=g)
    return x + y if shortcut else y


@dataclasses.dataclass
class Bottleneck(Layer):
    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def init(self, key):
        return _bottleneck_init(key, self.c1, self.c2, self.g, self.e)

    def import_torch(self, sd, prefix, fuse=True):
        return _bottleneck_import(sd, prefix, fuse)

    def __call__(self, p, x):
        return _bottleneck(p, x, shortcut=self.shortcut and self.c1 == self.c2, g=self.g)


@dataclasses.dataclass
class C3(Layer):
    """CSP bottleneck with 3 convs (common.py:126-138)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def init(self, key):
        c_ = int(self.c2 * self.e)
        ks = jax.random.split(key, self.n + 3)
        return {
            "cv1": _init_conv(ks[0], 1, self.c1, c_),
            "cv2": _init_conv(ks[1], 1, self.c1, c_),
            "cv3": _init_conv(ks[2], 1, 2 * c_, self.c2),
            "m": [_bottleneck_init(ks[3 + j], c_, c_, self.g, 1.0) for j in range(self.n)],
        }

    def import_torch(self, sd, prefix, fuse=True):
        return {
            "cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
            "cv2": _import_conv(sd, f"{prefix}.cv2", fuse),
            "cv3": _import_conv(sd, f"{prefix}.cv3", fuse),
            "m": [_bottleneck_import(sd, f"{prefix}.m.{j}", fuse) for j in range(self.n)],
        }

    def _inner(self, p, y):
        for bp in p["m"]:
            y = _bottleneck(bp, y, shortcut=self.shortcut, g=self.g)
        return y

    def __call__(self, p, x):
        y1 = self._inner(p, _conv(p["cv1"], x, k=1))
        y2 = _conv(p["cv2"], x, k=1)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], -1), k=1)


@dataclasses.dataclass
class BottleneckCSP(Layer):
    """CSP bottleneck, v4-style with standalone BN+SiLU on the concat
    (common.py:107-123)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def init(self, key):
        c_ = int(self.c2 * self.e)
        ks = jax.random.split(key, self.n + 5)
        return {
            "cv1": _init_conv(ks[0], 1, self.c1, c_),
            "cv2": _init_conv(ks[1], 1, self.c1, c_, bias=False, bn=False),
            "cv3": _init_conv(ks[2], 1, c_, c_, bias=False, bn=False),
            "cv4": _init_conv(ks[3], 1, 2 * c_, self.c2),
            "bn": {
                "gamma": jnp.ones((2 * c_,)), "beta": jnp.zeros((2 * c_,)),
                "mean": jnp.zeros((2 * c_,)), "var": jnp.ones((2 * c_,)),
            },
            "m": [_bottleneck_init(ks[5 + j], c_, c_, self.g, 1.0) for j in range(self.n)],
        }

    def import_torch(self, sd, prefix, fuse=True):
        return {
            "cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
            "cv2": {"w": jnp.asarray(cvt.conv_w(sd[f"{prefix}.cv2.weight"]))},
            "cv3": {"w": jnp.asarray(cvt.conv_w(sd[f"{prefix}.cv3.weight"]))},
            "cv4": _import_conv(sd, f"{prefix}.cv4", fuse),
            "bn": {
                "gamma": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.weight"])),
                "beta": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.bias"])),
                "mean": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.running_mean"])),
                "var": jnp.asarray(cvt.vec(sd[f"{prefix}.bn.running_var"])),
            },
            "m": [_bottleneck_import(sd, f"{prefix}.m.{j}", fuse) for j in range(self.n)],
        }

    def __call__(self, p, x):
        y = _conv(p["cv1"], x, k=1)
        for bp in p["m"]:
            y = _bottleneck(bp, y, shortcut=self.shortcut, g=self.g)
        y1 = tnn.conv2d(y, p["cv3"]["w"], padding=0)
        y2 = tnn.conv2d(x, p["cv2"]["w"], padding=0)
        cat = jnp.concatenate([y1, y2], -1)
        bn = p["bn"]
        cat = tnn.batch_norm(cat, bn["gamma"], bn["beta"], bn["mean"], bn["var"],
                             eps=1e-5)
        return _conv(p["cv4"], tnn.silu(cat), k=1)


@dataclasses.dataclass
class SPP(Layer):
    """Spatial pyramid pooling (common.py:165-178)."""

    c1: int
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    def init(self, key):
        c_ = self.c1 // 2
        k1, k2 = jax.random.split(key)
        return {"cv1": _init_conv(k1, 1, self.c1, c_),
                "cv2": _init_conv(k2, 1, c_ * (len(self.k) + 1), self.c2)}

    def import_torch(self, sd, prefix, fuse=True):
        return {"cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
                "cv2": _import_conv(sd, f"{prefix}.cv2", fuse)}

    def __call__(self, p, x):
        y = _conv(p["cv1"], x, k=1)
        pools = [tnn.max_pool2d(y, kk, 1, kk // 2) for kk in self.k]
        return _conv(p["cv2"], jnp.concatenate([y] + pools, -1), k=1)


@dataclasses.dataclass
class SPPF(Layer):
    """Fast SPP: 3 chained k-pools == SPP(k, 2k-1, 3k-2) (common.py:181-196)."""

    c1: int
    c2: int
    k: int = 5

    def init(self, key):
        c_ = self.c1 // 2
        k1, k2 = jax.random.split(key)
        return {"cv1": _init_conv(k1, 1, self.c1, c_),
                "cv2": _init_conv(k2, 1, c_ * 4, self.c2)}

    def import_torch(self, sd, prefix, fuse=True):
        return {"cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
                "cv2": _import_conv(sd, f"{prefix}.cv2", fuse)}

    def __call__(self, p, x):
        y = _conv(p["cv1"], x, k=1)
        y1 = tnn.max_pool2d(y, self.k, 1, self.k // 2)
        y2 = tnn.max_pool2d(y1, self.k, 1, self.k // 2)
        y3 = tnn.max_pool2d(y2, self.k, 1, self.k // 2)
        return _conv(p["cv2"], jnp.concatenate([y, y1, y2, y3], -1), k=1)


@dataclasses.dataclass
class GhostConv(Layer):
    """Ghost conv (common.py:211-221).  ``act`` applies to BOTH the primary
    and the cheap depthwise conv, matching the reference's
    ``Conv(..., act)`` pair; GhostBottleneck passes act="none" for its
    pw-linear second GhostConv (common.py:230)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: str = "silu"

    def init(self, key):
        c_ = self.c2 // 2
        k1, k2 = jax.random.split(key)
        return {"cv1": _init_conv(k1, self.k, self.c1, c_),
                "cv2": _init_conv(k2, 5, c_, c_, groups=c_)}

    def import_torch(self, sd, prefix, fuse=True):
        return {"cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
                "cv2": _import_conv(sd, f"{prefix}.cv2", fuse)}

    def __call__(self, p, x):
        c_ = self.c2 // 2
        y = _conv(p["cv1"], x, k=self.k, stride=self.s, act=self.act)
        return jnp.concatenate(
            [y, _conv(p["cv2"], y, k=5, groups=c_, act=self.act)], -1)


@dataclasses.dataclass
class GhostBottleneck(Layer):
    """Ghost bottleneck (common.py:224-236)."""

    c1: int
    c2: int
    k: int = 3
    s: int = 1

    def init(self, key):
        c_ = self.c2 // 2
        ks = jax.random.split(key, 5)
        gc1 = GhostConv(self.c1, c_, 1, 1)
        gc2 = GhostConv(c_, self.c2, 1, 1)
        p = {"g1": gc1.init(ks[0]), "g2": gc2.init(ks[1])}
        if self.s == 2:
            p["dw"] = _init_conv(ks[2], self.k, c_, c_, groups=math.gcd(c_, c_))
            p["sc_dw"] = _init_conv(ks[3], self.k, self.c1, self.c1, groups=self.c1)
            p["sc_pw"] = _init_conv(ks[4], 1, self.c1, self.c2)
        return p

    def import_torch(self, sd, prefix, fuse=True):
        p = {"g1": {"cv1": _import_conv(sd, f"{prefix}.conv.0.cv1", fuse),
                    "cv2": _import_conv(sd, f"{prefix}.conv.0.cv2", fuse)},
             "g2": {"cv1": _import_conv(sd, f"{prefix}.conv.2.cv1", fuse),
                    "cv2": _import_conv(sd, f"{prefix}.conv.2.cv2", fuse)}}
        if self.s == 2:
            p["dw"] = _import_conv(sd, f"{prefix}.conv.1", fuse)
            p["sc_dw"] = _import_conv(sd, f"{prefix}.shortcut.0", fuse)
            p["sc_pw"] = _import_conv(sd, f"{prefix}.shortcut.1", fuse)
        return p

    def __call__(self, p, x):
        c_ = self.c2 // 2
        g1 = GhostConv(self.c1, c_, 1, 1)
        # pw-linear: the reference builds GhostConv(c_, c2, 1, 1, act=False)
        # (common.py:230) — no activation anywhere in the second ghost conv
        g2 = GhostConv(c_, self.c2, 1, 1, act="none")
        y = g1(p["g1"], x)
        if self.s == 2:
            y = _conv(p["dw"], y, k=self.k, stride=2, groups=c_, act="none")
        y = g2(p["g2"], y)
        if self.s == 2:
            sc = _conv(p["sc_dw"], x, k=self.k, stride=2, groups=self.c1, act="none")
            sc = _conv(p["sc_pw"], sc, k=1, act="none")
        else:
            sc = x
        return y + sc


@dataclasses.dataclass
class TransformerBlockL(Layer):
    """ViT block on a conv feature map, LayerNorm-free (common.py:58-91).

    Tokens = flattened H*W positions; learnable positional Linear; per-layer
    q/k/v Linears (no bias) feeding torch-style MultiheadAttention
    (in_proj + out_proj, bias=True) + two bias-free FC residuals.
    """

    c1: int
    c2: int
    num_heads: int = 4
    num_layers: int = 1

    def init(self, key):
        c = self.c2
        ks = jax.random.split(key, 2 + self.num_layers)
        p: Dict[str, Any] = {}
        if self.c1 != self.c2:
            p["conv"] = _init_conv(ks[0], 1, self.c1, c)
        bound = float(np.sqrt(1.0 / c))
        p["linear"] = {
            "w": jax.random.uniform(ks[1], (c, c), jnp.float32, -bound, bound),
            "b": jax.random.uniform(ks[1], (c,), jnp.float32, -bound, bound),
        }
        p["tr"] = []
        for j in range(self.num_layers):
            kk = jax.random.split(ks[2 + j], 8)
            lay = {
                "q": jax.random.uniform(kk[0], (c, c), jnp.float32, -bound, bound),
                "k": jax.random.uniform(kk[1], (c, c), jnp.float32, -bound, bound),
                "v": jax.random.uniform(kk[2], (c, c), jnp.float32, -bound, bound),
                "in_proj_w": jax.random.uniform(kk[3], (c, 3 * c), jnp.float32, -bound, bound),
                "in_proj_b": jnp.zeros((3 * c,), jnp.float32),
                "out_proj_w": jax.random.uniform(kk[4], (c, c), jnp.float32, -bound, bound),
                "out_proj_b": jnp.zeros((c,), jnp.float32),
                "fc1": jax.random.uniform(kk[5], (c, c), jnp.float32, -bound, bound),
                "fc2": jax.random.uniform(kk[6], (c, c), jnp.float32, -bound, bound),
            }
            p["tr"].append(lay)
        return p

    def import_torch(self, sd, prefix, fuse=True):
        p: Dict[str, Any] = {}
        if f"{prefix}.conv.conv.weight" in sd:
            p["conv"] = _import_conv(sd, f"{prefix}.conv", fuse)
        p["linear"] = {"w": jnp.asarray(cvt.linear_w(sd[f"{prefix}.linear.weight"])),
                       "b": jnp.asarray(cvt.vec(sd[f"{prefix}.linear.bias"]))}
        p["tr"] = []
        for j in range(self.num_layers):
            q = f"{prefix}.tr.{j}"
            p["tr"].append({
                "q": jnp.asarray(cvt.linear_w(sd[f"{q}.q.weight"])),
                "k": jnp.asarray(cvt.linear_w(sd[f"{q}.k.weight"])),
                "v": jnp.asarray(cvt.linear_w(sd[f"{q}.v.weight"])),
                "in_proj_w": jnp.asarray(cvt.linear_w(sd[f"{q}.ma.in_proj_weight"])),
                "in_proj_b": jnp.asarray(cvt.vec(sd[f"{q}.ma.in_proj_bias"])),
                "out_proj_w": jnp.asarray(cvt.linear_w(sd[f"{q}.ma.out_proj.weight"])),
                "out_proj_b": jnp.asarray(cvt.vec(sd[f"{q}.ma.out_proj.bias"])),
                "fc1": jnp.asarray(cvt.linear_w(sd[f"{q}.fc1.weight"])),
                "fc2": jnp.asarray(cvt.linear_w(sd[f"{q}.fc2.weight"])),
            })
        return p

    def _mha(self, lp, q, k, v):
        """torch F.multi_head_attention_forward semantics, batched NHWC-style:
        inputs (B, L, C)."""
        c = self.c2
        h = self.num_heads
        dk = c // h
        wq, wk, wv = (lp["in_proj_w"][:, :c], lp["in_proj_w"][:, c : 2 * c],
                      lp["in_proj_w"][:, 2 * c :])
        bq, bk, bv = (lp["in_proj_b"][:c], lp["in_proj_b"][c : 2 * c],
                      lp["in_proj_b"][2 * c :])
        q2 = tnn.linear(q, wq, bq)
        k2 = tnn.linear(k, wk, bk)
        v2 = tnn.linear(v, wv, bv)
        B, L, _ = q2.shape
        q2 = q2.reshape(B, L, h, dk).transpose(0, 2, 1, 3) / np.sqrt(dk)
        k2 = k2.reshape(B, L, h, dk).transpose(0, 2, 1, 3)
        v2 = v2.reshape(B, L, h, dk).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhld,bhmd->bhlm", q2, k2,
                         precision=tnn.default_precision())
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhlm,bhmd->bhld", att, v2,
                         precision=tnn.default_precision())
        out = out.transpose(0, 2, 1, 3).reshape(B, L, c)
        return tnn.linear(out, lp["out_proj_w"], lp["out_proj_b"])

    def __call__(self, p, x):
        if "conv" in p:
            x = _conv(p["conv"], x, k=1)
        B, H, W, C = x.shape
        t = x.reshape(B, H * W, C)  # same token order as torch flatten(2)
        t = t + tnn.linear(t, p["linear"]["w"], p["linear"]["b"])
        for lp in p["tr"]:
            q = tnn.linear(t, lp["q"])
            k = tnn.linear(t, lp["k"])
            v = tnn.linear(t, lp["v"])
            t = self._mha(lp, q, k, v) + t
            t = tnn.linear(tnn.linear(t, lp["fc1"]), lp["fc2"]) + t
        return t.reshape(B, H, W, C)


@dataclasses.dataclass
class C3TR(C3):
    """C3 with a TransformerBlock inner (common.py:141-146)."""

    def __post_init__(self):
        super().__post_init__()
        c_ = int(self.c2 * self.e)
        self.tb = TransformerBlockL(c_, c_, 4, self.n)

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {
            "cv1": _init_conv(ks[0], 1, self.c1, int(self.c2 * self.e)),
            "cv2": _init_conv(ks[1], 1, self.c1, int(self.c2 * self.e)),
            "cv3": _init_conv(ks[2], 1, 2 * int(self.c2 * self.e), self.c2),
            "m": self.tb.init(ks[3]),
        }

    def import_torch(self, sd, prefix, fuse=True):
        return {
            "cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
            "cv2": _import_conv(sd, f"{prefix}.cv2", fuse),
            "cv3": _import_conv(sd, f"{prefix}.cv3", fuse),
            "m": self.tb.import_torch(sd, f"{prefix}.m", fuse),
        }

    def __call__(self, p, x):
        y1 = self.tb(p["m"], _conv(p["cv1"], x, k=1))
        y2 = _conv(p["cv2"], x, k=1)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], -1), k=1)


@dataclasses.dataclass
class C3SPP(C3):
    """C3 with an SPP inner (common.py:149-154)."""

    k: Tuple[int, ...] = (5, 9, 13)

    def __post_init__(self):
        super().__post_init__()
        c_ = int(self.c2 * self.e)
        self.spp = SPP(c_, c_, self.k)

    def init(self, key):
        ks = jax.random.split(key, 4)
        c_ = int(self.c2 * self.e)
        return {"cv1": _init_conv(ks[0], 1, self.c1, c_),
                "cv2": _init_conv(ks[1], 1, self.c1, c_),
                "cv3": _init_conv(ks[2], 1, 2 * c_, self.c2),
                "m": self.spp.init(ks[3])}

    def import_torch(self, sd, prefix, fuse=True):
        return {"cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
                "cv2": _import_conv(sd, f"{prefix}.cv2", fuse),
                "cv3": _import_conv(sd, f"{prefix}.cv3", fuse),
                "m": self.spp.import_torch(sd, f"{prefix}.m", fuse)}

    def __call__(self, p, x):
        y1 = self.spp(p["m"], _conv(p["cv1"], x, k=1))
        y2 = _conv(p["cv2"], x, k=1)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], -1), k=1)


@dataclasses.dataclass
class C3Ghost(C3):
    """C3 with GhostBottleneck inners (common.py:157-162)."""

    def init(self, key):
        c_ = int(self.c2 * self.e)
        ks = jax.random.split(key, self.n + 3)
        return {
            "cv1": _init_conv(ks[0], 1, self.c1, c_),
            "cv2": _init_conv(ks[1], 1, self.c1, c_),
            "cv3": _init_conv(ks[2], 1, 2 * c_, self.c2),
            "m": [GhostBottleneck(c_, c_).init(ks[3 + j]) for j in range(self.n)],
        }

    def import_torch(self, sd, prefix, fuse=True):
        c_ = int(self.c2 * self.e)
        gb = GhostBottleneck(c_, c_)
        return {
            "cv1": _import_conv(sd, f"{prefix}.cv1", fuse),
            "cv2": _import_conv(sd, f"{prefix}.cv2", fuse),
            "cv3": _import_conv(sd, f"{prefix}.cv3", fuse),
            "m": [gb.import_torch(sd, f"{prefix}.m.{j}", fuse) for j in range(self.n)],
        }

    def __call__(self, p, x):
        c_ = int(self.c2 * self.e)
        gb = GhostBottleneck(c_, c_)
        y = _conv(p["cv1"], x, k=1)
        for gp in p["m"]:
            y = gb(gp, y)
        y2 = _conv(p["cv2"], x, k=1)
        return _conv(p["cv3"], jnp.concatenate([y, y2], -1), k=1)


@dataclasses.dataclass
class Classify(Layer):
    """Classification head: GAP conv + flatten (common.py:666-675)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1

    def init(self, key):
        return _init_conv(key, self.k, self.c1, self.c2, bias=True, bn=False)

    def import_torch(self, sd, prefix, fuse=True):
        return {"w": jnp.asarray(cvt.conv_w(sd[f"{prefix}.conv.weight"])),
                "b": jnp.asarray(cvt.vec(sd[f"{prefix}.conv.bias"]))}

    def __call__(self, p, x):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate([jnp.mean(xi, (1, 2)) for xi in x], -1)
        else:
            x = jnp.mean(x, (1, 2))
        y = tnn.conv2d(x[:, None, None, :], p["w"], p.get("b"),
                       stride=self.s, padding=0)
        return y.reshape(y.shape[0], -1)


@dataclasses.dataclass
class Upsample(Layer):
    scale: int = 2
    mode: str = "nearest"

    def __call__(self, p, x):
        assert self.mode == "nearest"
        return tnn.upsample_nearest(x, self.scale)


@dataclasses.dataclass
class Concat(Layer):
    axis: int = -1

    def __call__(self, p, xs):
        return jnp.concatenate(xs, -1)


@dataclasses.dataclass
class Contract(Layer):
    """WxH -> channels (common.py:239-250)."""

    gain: int = 2

    def __call__(self, p, x):
        return tnn.pixel_unshuffle(x, self.gain)


@dataclasses.dataclass
class Expand(Layer):
    """channels -> WxH (common.py:253-264)."""

    gain: int = 2

    def __call__(self, p, x):
        return tnn.pixel_shuffle(x, self.gain)


@dataclasses.dataclass
class Detect(Layer):
    """Detection head with fused decode (yolo.py:33-81).

    Per level: 1x1 conv -> (B, ny, nx, na, 5+nc) -> sigmoid ->
    xy = (2s-0.5+grid)*stride, wh = (2s)^2 * anchor_px.
    Output (train=False): (B, sum na*ny*nx, 5+nc) in torch's
    (anchor-major, row-major) flatten order for bit parity.
    """

    nc: int
    anchors: Any  # (nl, na, 2) in *grid units* (already / stride)
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = ()

    def __post_init__(self):
        super().__post_init__()
        self.anchors = np.asarray(self.anchors, np.float32)
        self.nl = self.anchors.shape[0]
        self.na = self.anchors.shape[1]
        self.no = self.nc + 5

    def init(self, key):
        ks = jax.random.split(key, self.nl)
        return {"m": [
            _init_conv(ks[l], 1, self.ch[l], self.na * self.no, bias=True, bn=False)
            for l in range(self.nl)
        ]}

    def import_torch(self, sd, prefix, fuse=True):
        return {"m": [
            {"w": jnp.asarray(cvt.conv_w(sd[f"{prefix}.m.{l}.weight"])),
             "b": jnp.asarray(cvt.vec(sd[f"{prefix}.m.{l}.bias"]))}
            for l in range(self.nl)
        ]}

    def __call__(self, p, xs, decode=True):
        if not isinstance(xs, (list, tuple)):
            xs = [xs]
        raws, outs = [], []
        for l, x in enumerate(xs):
            y = tnn.conv2d(x, p["m"][l]["w"], p["m"][l]["b"], padding=0)
            B, ny, nx, _ = y.shape
            y = y.reshape(B, ny, nx, self.na, self.no)
            # torch layout is (B, na, ny, nx, no)
            y = y.transpose(0, 3, 1, 2, 4)
            raws.append(y)
            if decode:
                s = float(self.strides[l])
                gy, gx = jnp.meshgrid(
                    jnp.arange(ny, dtype=y.dtype), jnp.arange(nx, dtype=y.dtype),
                    indexing="ij",
                )
                grid = jnp.stack([gx, gy], -1)  # (ny, nx, 2)
                anc = jnp.asarray(self.anchors[l] * s, y.dtype)  # (na, 2) px
                sig = jax.nn.sigmoid(y)
                xy = (sig[..., 0:2] * 2.0 - 0.5 + grid[None, None]) * s
                wh = (sig[..., 2:4] * 2.0) ** 2 * anc[None, :, None, None, :]
                out = jnp.concatenate([xy, wh, sig[..., 4:]], -1)
                outs.append(out.reshape(B, self.na * ny * nx, self.no))
        if decode:
            return jnp.concatenate(outs, 1), raws
        return raws


def _update_bn_tree(params, ctx: Dict[int, Any]):
    """Return a copy of params where every BN dict recorded in ``ctx`` gets
    EMA-updated running statistics (torch momentum semantics:
    new = (1-m)*old + m*batch)."""

    def walk(node):
        if isinstance(node, dict):
            if id(node) in ctx and "mean" in node and "var" in node:
                mean, var = ctx[id(node)]
                m = _BN_MOMENTUM
                return {
                    **node,
                    "mean": jax.lax.stop_gradient(
                        (1 - m) * node["mean"] + m * mean
                    ),
                    "var": jax.lax.stop_gradient(
                        (1 - m) * node["var"] + m * var
                    ),
                }
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, tuple):
            return tuple(walk(v) for v in node)
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# spec -> plan builder (the parse_model equivalent)


@dataclasses.dataclass(frozen=True)
class YoloSpec:
    """Architecture spec: same grammar as the reference yaml files."""

    nc: int
    depth_multiple: float
    width_multiple: float
    anchors: Any  # list of per-level [w1,h1,w2,h2,...] in px, or int (# per level)
    backbone: Tuple[tuple, ...]
    head: Tuple[tuple, ...]
    ch: int = 3


_MODULE_NAMES = {
    "Conv": Conv, "DWConv": DWConv, "Focus": Focus, "Bottleneck": Bottleneck,
    "BottleneckCSP": BottleneckCSP, "C3": C3, "C3TR": C3TR, "C3SPP": C3SPP,
    "C3Ghost": C3Ghost, "GhostConv": GhostConv, "GhostBottleneck": GhostBottleneck,
    "SPP": SPP, "SPPF": SPPF, "Concat": Concat, "Contract": Contract,
    "Expand": Expand, "nn.Upsample": Upsample, "Upsample": Upsample,
    "Detect": Detect, "Classify": Classify,
}


class YoloModel:
    """A built layer plan + pure apply.

    ``apply(params, x)`` returns ``(pred, raws)`` where pred is the decoded
    (B, N, 5+nc) tensor and raws the per-level (B, na, ny, nx, no) maps
    (pre-sigmoid, for the training loss)."""

    def __init__(self, spec: YoloSpec, layers: List[Layer], save: List[int],
                 strides: Tuple[int, ...], anchors_grid: np.ndarray):
        self.spec = spec
        self.layers = layers
        self.save = save
        self.strides = strides
        self.anchors = anchors_grid  # (nl, na, 2) grid units
        self.detect: Detect = layers[-1]  # type: ignore

    @property
    def nc(self) -> int:
        return self.spec.nc

    def init(self, key) -> List[Params]:
        ks = jax.random.split(key, len(self.layers))
        return [l.init(ks[i]) for i, l in enumerate(self.layers)]

    def import_torch(self, sd: Dict[str, np.ndarray], fuse: bool = True,
                     prefix: str = "model") -> List[Params]:
        return [l.import_torch(sd, f"{prefix}.{l.i}", fuse) for l in self.layers]

    def apply(self, params: List[Params], x, decode: bool = True,
              train: bool = False, front: Optional[Any] = None,
              mid: Optional[Any] = None,
              packed_frames: Optional[Any] = None,
              packed_hw: Optional[Any] = None):
        """Forward.  ``train=True`` switches BN to batch statistics and
        additionally returns a params pytree with EMA-updated running stats:
        ``(out, new_params)``.

        ``front``: packed weights from
        :func:`lpr_tpu.ops.pallas.yolo_front.front_pack_from_params` —
        runs layers 0-2 through the fused Pallas front-end kernel
        (inference only, bf16 input, geometry accepted by ``front_geom``).
        ``mid``: packed weights from
        :func:`lpr_tpu.ops.pallas.yolo_mid.mid_pack_from_params` — extends
        the fused path through layers 3-4 (requires ``front``).
        ``packed_frames`` (+ ``packed_hw`` (h, w)): host-packed uint8
        quarter-grid input (pack_front_frames_host) consumed directly by
        the fused front (requires ``front`` packed with input_scale=1/255);
        ``x`` is ignored for the forward and may be None."""
        use_front = use_packed = False
        if packed_frames is not None:
            assert front is not None and not train and packed_hw is not None
            use_front = use_packed = True
        elif front is not None and not train and x.dtype == jnp.bfloat16 \
                and x.ndim == 4 and x.shape[3] == 3:
            from lpr_tpu.ops.pallas.yolo_front import front_geom

            try:
                front_geom(x.shape[1], x.shape[2])
                use_front = True
            except ValueError:
                pass
        ctx: Optional[Dict[int, Any]] = {} if train else None
        _BN_CTX[0] = ctx
        try:
            saved: Dict[int, Any] = {}
            y = x
            start = 0
            if use_front:
                from lpr_tpu.ops.pallas.yolo_front import (front_apply,
                                                           front_fused,
                                                           front_geom)

                if use_packed:
                    y = front_fused(packed_frames, front,
                                    geom=front_geom(*packed_hw))
                else:
                    y = front_apply(x, front)
                if 2 in self.save:
                    saved[2] = y
                start = 3
                if mid is not None:
                    from lpr_tpu.ops.pallas.yolo_mid import (mid_apply,
                                                             mid_geom)

                    try:
                        mid_geom(y.shape[1], y.shape[2])
                    except ValueError:
                        pass
                    else:
                        y = mid_apply(y, mid)
                        if 4 in self.save:
                            saved[4] = y
                        start = 5
            for l, p in zip(self.layers[start:], params[start:]):
                if l.f != -1:
                    if isinstance(l.f, int):
                        y = saved[l.f % len(self.layers)] if l.f >= 0 else y
                    else:
                        y = [y if j == -1 else saved[j % len(self.layers)]
                             for j in l.f]
                y = l(p, y) if not isinstance(l, Detect) else l(p, y, decode=decode)
                if l.i in self.save:
                    saved[l.i] = y
        finally:
            _BN_CTX[0] = None
        if not train:
            return y
        new_params = _update_bn_tree(params, ctx)
        return y, new_params


def quantize_yolo(model: YoloModel, params: List[Params],
                  min_contract: int = 64) -> List[Params]:
    """Post-training int8 quantization of a detector's conv weights.

    Returns a params pytree where every eligible conv dict is replaced by
    ``{"w_q": int8 HWIO, "w_s": (Cout,) f32, "b": f32}`` — dispatched to the
    int8 MXU path by ``_conv``; activations are quantized dynamically per
    tensor at run time (no calibration pass).  BN is folded into the
    quantized weights (inference-only transform: the result cannot be
    trained).  Skipped, staying in bf16/f32:

    - the Detect head 1x1 convs (decode precision);
    - S2D-transformed stem convs (their weights are rearranged in apply);
    - depthwise convs (VPU work, nothing to gain on the MXU);
    - convs whose contraction K = kh*kw*Cin/groups < ``min_contract``
      (lane-starved on the MXU either way).

    The reference has no quantized path (its Triton configs run fp32 ONNX);
    this is the TPU-native equivalent of a TensorRT int8 deployment.
    """

    def quant_dict(p: Dict[str, Any]) -> Dict[str, Any]:
        w = np.asarray(p["w"], np.float32)
        b = None if p.get("b") is None else np.asarray(p["b"], np.float32)
        if "bn" in p:
            bn = p["bn"]
            w, b = tnn.fuse_conv_bn(
                w, b, np.asarray(bn["gamma"]), np.asarray(bn["beta"]),
                np.asarray(bn["mean"]), np.asarray(bn["var"]), eps=_BN_EPS)
        wq, ws = tnn.quantize_conv_weight(w)
        out = {"w_q": wq, "w_s": ws}
        if b is not None:
            out["b"] = jnp.asarray(b, jnp.float32)
        return out

    def eligible(w) -> bool:
        kh, kw, cig, _ = w.shape
        return cig > 1 and kh * kw * cig >= min_contract

    def walk(node):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") and node["w"].ndim == 4:
                return quant_dict(node) if eligible(node["w"]) else dict(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    out: List[Params] = []
    for layer, p in zip(model.layers, params):
        skip = isinstance(layer, Detect) or (
            isinstance(layer, Conv)
            and (layer._is_s2d_stem() or layer._is_s2d_down()))
        out.append(p if skip else walk(p))
    return out


def build_yolo(spec: YoloSpec,
               ckpt_anchors: Optional[np.ndarray] = None,
               strides: Optional[Sequence[int]] = None) -> YoloModel:
    """parse_model equivalent (yolo.py:243-294): width/depth scaling,
    from-index wiring, channel propagation.

    ``ckpt_anchors`` (grid units, from a checkpoint's Detect buffer)
    overrides spec anchors — needed for AutoAnchor-evolved models whose yaml
    just says ``anchors: N`` (the char OCR model).
    """
    gd, gw = spec.depth_multiple, spec.width_multiple
    rows = list(spec.backbone) + list(spec.head)
    ch = [spec.ch]
    layers: List[Layer] = []
    save: List[int] = []
    detect_from: List[int] = []
    for i, (f, n, mname, args) in enumerate(rows):
        cls = _MODULE_NAMES[mname]
        n_scaled = max(round(n * gd), 1) if n > 1 else n
        c1 = ch[f if isinstance(f, int) else f[0]]
        if cls in (Conv, DWConv, Focus, Bottleneck, GhostBottleneck, SPP, SPPF,
                   GhostConv, BottleneckCSP, C3, C3TR, C3SPP, C3Ghost):
            c2 = args[0]
            c2 = make_divisible(c2 * gw, 8)
            largs = [c1, c2] + list(args[1:])
            if cls in (BottleneckCSP, C3, C3TR, C3SPP, C3Ghost):
                if cls is C3SPP:
                    lay = C3SPP(c1, c2, n=n_scaled,
                                k=tuple(args[1]) if len(args) > 1 else (5, 9, 13))
                else:
                    shortcut = args[1] if len(args) > 1 else True
                    lay = cls(c1, c2, n=n_scaled, shortcut=shortcut)
            elif cls is SPP:
                lay = cls(c1, c2, tuple(args[1]) if len(args) > 1 else (5, 9, 13))
            elif cls is SPPF:
                lay = cls(c1, c2, args[1] if len(args) > 1 else 5)
            elif cls in (Conv, DWConv):
                k = args[1] if len(args) > 1 else 1
                s = args[2] if len(args) > 2 else 1
                pad = args[3] if len(args) > 3 else None
                lay = cls(c1, c2, k, s, pad)
            elif cls is Focus:
                lay = cls(c1, c2, args[1] if len(args) > 1 else 1,
                          args[2] if len(args) > 2 else 1)
            elif cls is GhostConv:
                lay = cls(c1, c2, args[1] if len(args) > 1 else 1,
                          args[2] if len(args) > 2 else 1)
            elif cls is GhostBottleneck:
                lay = cls(c1, c2, args[1] if len(args) > 1 else 3,
                          args[2] if len(args) > 2 else 1)
            elif cls is Bottleneck:
                lay = cls(c1, c2, args[1] if len(args) > 1 else True)
            else:
                lay = cls(c1, c2)
        elif cls is Concat:
            c2 = sum(ch[j] for j in f)
            lay = Concat()
        elif cls is Upsample:
            c2 = c1
            lay = Upsample(scale=int(args[1]) if len(args) > 1 else 2)
        elif cls in (Contract, Expand):
            g = args[0] if args else 2
            c2 = c1 * g * g if cls is Contract else c1 // (g * g)
            lay = cls(g)
        elif cls is Classify:
            c2 = args[0]
            lay = Classify(c1, c2)
        elif cls is Detect:
            detect_from = list(f)
            chs = tuple(ch[j] for j in f)
            if ckpt_anchors is not None:
                anchors_grid = np.asarray(ckpt_anchors, np.float32)
            elif isinstance(spec.anchors, int):
                anchors_grid = np.ones((len(f), spec.anchors, 2), np.float32)
            else:
                a = np.asarray(spec.anchors, np.float32).reshape(len(f), -1, 2)
                st = np.asarray(strides, np.float32).reshape(-1, 1, 1)
                anchors_grid = a / st  # px -> grid units
            if strides is None:
                raise ValueError("Detect needs strides")
            lay = Detect(spec.nc, anchors_grid, chs, tuple(strides))
            c2 = c1
        else:
            c2 = c1
            lay = cls()
        lay.i, lay.f = i, f
        layers.append(lay)
        save.extend(
            j % i for j in ([f] if isinstance(f, int) else f) if j != -1
        )
        if i == 0:
            ch = []
        ch.append(c2)
    save = sorted(set(save))
    det = layers[-1]
    return YoloModel(spec, layers, save, tuple(strides), det.anchors)


# ---------------------------------------------------------------------------
# production specs


def yolov5_spec(nc: int = 80, depth: float = 0.33, width: float = 0.5,
                anchors=None) -> YoloSpec:
    """Standard 3-scale YOLOv5 v6.0 (reference models/yolov5s.yaml).
    depth/width: n=0.33/0.25, s=0.33/0.5, m=0.67/0.75, l=1/1, x=1.33/1.25."""
    if anchors is None:
        anchors = [[10, 13, 16, 30, 33, 23],
                   [30, 61, 62, 45, 59, 119],
                   [116, 90, 156, 198, 373, 326]]
    backbone = (
        (-1, 1, "Conv", [64, 6, 2, 2]),
        (-1, 1, "Conv", [128, 3, 2]),
        (-1, 3, "C3", [128]),
        (-1, 1, "Conv", [256, 3, 2]),
        (-1, 6, "C3", [256]),
        (-1, 1, "Conv", [512, 3, 2]),
        (-1, 9, "C3", [512]),
        (-1, 1, "Conv", [1024, 3, 2]),
        (-1, 3, "C3", [1024]),
        (-1, 1, "SPPF", [1024, 5]),
    )
    head = (
        (-1, 1, "Conv", [512, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 6], 1, "Concat", [1]),
        (-1, 3, "C3", [512, False]),
        (-1, 1, "Conv", [256, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 4], 1, "Concat", [1]),
        (-1, 3, "C3", [256, False]),
        (-1, 1, "Conv", [256, 3, 2]),
        ([-1, 14], 1, "Concat", [1]),
        (-1, 3, "C3", [512, False]),
        (-1, 1, "Conv", [512, 3, 2]),
        ([-1, 10], 1, "Concat", [1]),
        (-1, 3, "C3", [1024, False]),
        ([17, 20, 23], 1, "Detect", ["nc", "anchors"]),
    )
    return YoloSpec(nc, depth, width, anchors, backbone, head)


def yolov5_p6_spec(nc: int = 80, depth: float = 0.33, width: float = 0.5,
                   anchors=None) -> YoloSpec:
    """4-scale P6/64 hub variant (reference models/hub/yolov5s6.yaml):
    backbone grows a 768-ch P5 stage before the 1024-ch P6 + SPPF, the PAN
    runs three up / three down steps, Detect reads P3/P4/P5/P6 (strides
    8/16/32/64; use with a 64-multiple input size)."""
    if anchors is None:
        anchors = [[19, 27, 44, 40, 38, 94],
                   [96, 68, 86, 152, 180, 137],
                   [140, 301, 303, 264, 238, 542],
                   [436, 615, 739, 380, 925, 792]]
    backbone = (
        (-1, 1, "Conv", [64, 6, 2, 2]),
        (-1, 1, "Conv", [128, 3, 2]),
        (-1, 3, "C3", [128]),
        (-1, 1, "Conv", [256, 3, 2]),
        (-1, 6, "C3", [256]),
        (-1, 1, "Conv", [512, 3, 2]),
        (-1, 9, "C3", [512]),
        (-1, 1, "Conv", [768, 3, 2]),
        (-1, 3, "C3", [768]),
        (-1, 1, "Conv", [1024, 3, 2]),
        (-1, 3, "C3", [1024]),
        (-1, 1, "SPPF", [1024, 5]),
    )
    head = (
        (-1, 1, "Conv", [768, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 8], 1, "Concat", [1]),
        (-1, 3, "C3", [768, False]),
        (-1, 1, "Conv", [512, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 6], 1, "Concat", [1]),
        (-1, 3, "C3", [512, False]),
        (-1, 1, "Conv", [256, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 4], 1, "Concat", [1]),
        (-1, 3, "C3", [256, False]),
        (-1, 1, "Conv", [256, 3, 2]),
        ([-1, 20], 1, "Concat", [1]),
        (-1, 3, "C3", [512, False]),
        (-1, 1, "Conv", [512, 3, 2]),
        ([-1, 16], 1, "Concat", [1]),
        (-1, 3, "C3", [768, False]),
        (-1, 1, "Conv", [768, 3, 2]),
        ([-1, 12], 1, "Concat", [1]),
        (-1, 3, "C3", [1024, False]),
        ([23, 26, 29, 32], 1, "Detect", ["nc", "anchors"]),
    )
    return YoloSpec(nc, depth, width, anchors, backbone, head)


def plate_detector() -> YoloModel:
    """The production plate detector: yolov5s-scale, nc=11, 3 scales —
    structural parity with onnx_models/detection/config.pbtxt (1280^2 ->
    100800x16; weights/object.pt is a missing blob upstream)."""
    return build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))


def char_ocr_spec() -> YoloSpec:
    """Single-scale stride-8 char OCR architecture recovered from
    weights/char.pt metadata (SURVEY.md §2.3): Focus stem, SPP, C3TR tail,
    PAN up-path, Detect on P3 only with 2 evolved anchors."""
    backbone = (
        (-1, 1, "Focus", [32, 3]),
        (-1, 1, "Conv", [64, 3, 2]),
        (-1, 3, "C3", [64]),
        (-1, 1, "Conv", [128, 3, 2]),
        (-1, 9, "C3", [128]),
        (-1, 1, "Conv", [256, 3, 2]),
        (-1, 9, "C3", [256]),
        (-1, 1, "Conv", [512, 3, 2]),
        (-1, 1, "SPP", [512, [5, 9, 13]]),
        (-1, 3, "C3TR", [512, False]),
    )
    head = (
        (-1, 1, "Conv", [256, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 6], 1, "Concat", [1]),
        (-1, 3, "C3", [256, False]),
        (-1, 1, "Conv", [128, 1, 1]),
        (-1, 1, "nn.Upsample", [None, 2, "nearest"]),
        ([-1, 4], 1, "Concat", [1]),
        (-1, 3, "C3", [128, False]),
        ([17], 1, "Detect", ["nc", "anchors"]),
    )
    return YoloSpec(36, 0.33, 0.5, 2, backbone, head)


_SIZE_PRESETS = {
    "n": (0.33, 0.25), "s": (0.33, 0.50), "m": (0.67, 0.75),
    "l": (1.00, 1.00), "x": (1.33, 1.25),
}


def yolov5(size: str = "s", nc: int = 80, strides=None) -> YoloModel:
    """Named model zoo: yolov5{n,s,m,l,x} and the P6 hub variants
    yolov5{n,s,m,l,x}6 (reference models/*.yaml + models/hub/*6.yaml)."""
    p6 = size.endswith("6")
    base = size[:-1] if p6 else size
    if base not in _SIZE_PRESETS:
        raise ValueError(
            f"unknown yolov5 size {size!r}: expected one of "
            f"{sorted(_SIZE_PRESETS)} or their P6 variants ('n6'..'x6')")
    depth, width = _SIZE_PRESETS[base]
    if strides is None:
        strides = (8, 16, 32, 64) if p6 else (8, 16, 32)
    spec_fn = yolov5_p6_spec if p6 else yolov5_spec
    return build_yolo(spec_fn(nc=nc, depth=depth, width=width),
                      strides=strides)


def apply_augmented(model: YoloModel, params, x):
    """Test-time augmentation: multi-scale + lr-flip forward with prediction
    de-scaling and tail clipping (reference Model._forward_augment,
    yolo.py:128-140,155-181).  x: (B, H, W, 3)."""
    import jax.image

    h, w = x.shape[1], x.shape[2]
    gs = int(max(model.strides))
    scales = [1.0, 0.83, 0.67]
    flips = [None, "lr", None]
    preds = []
    for si, fl in zip(scales, flips):
        xi = x
        if fl == "lr":
            xi = xi[:, :, ::-1, :]
        if si != 1.0:
            nh = math.ceil(h * si / gs) * gs
            nw = math.ceil(w * si / gs) * gs
            xi = jax.image.resize(xi, (x.shape[0], nh, nw, x.shape[3]),
                                  "bilinear")
        pred, _ = model.apply(params, xi)
        pred = pred.astype(jnp.float32)
        scale_back = (xi.shape[2] / w) if si != 1.0 else 1.0
        xy = pred[..., 0:2] / scale_back
        wh = pred[..., 2:4] / scale_back
        if fl == "lr":
            xy = jnp.stack([w - xy[..., 0], xy[..., 1]], -1)
        preds.append(jnp.concatenate([xy, wh, pred[..., 4:]], -1))
    # clip augmented tails (reference _clip_augmented, yolo.py:168-177):
    # drop the coarsest-level tail of the full-scale pass and the
    # finest-level head of the smallest-scale pass.
    nl = len(model.strides)
    g = sum(4**i for i in range(nl))
    i0 = preds[0].shape[1] // g  # one coarsest-level cell group
    preds[0] = preds[0][:, : preds[0].shape[1] - i0]
    ilast = preds[-1].shape[1] // g * (4 ** (nl - 1))
    preds[-1] = preds[-1][:, ilast:]
    return jnp.concatenate(preds, axis=1)


class YoloEnsemble:
    """NMS-ensemble of YOLO models: decoded detections concatenated along
    the box dimension, then one NMS pass (reference Ensemble.forward,
    ``models/experimental.py:89-99`` — the active ``torch.cat(y, 1)``
    branch).  Apply-compatible with :class:`YoloModel` for inference."""

    def __init__(self, models):
        assert len(models) >= 2
        assert len({m.nc for m in models}) == 1, "ensemble nc mismatch"
        self.models = list(models)
        self.nc = models[0].nc
        # letterbox alignment uses the coarsest stride (attempt_load:117)
        self.stride = max((max(m.strides) for m in models))
        self.strides = max((m.strides for m in models), key=max)

    def init(self, key):
        import jax

        return [m.init(k) for m, k in
                zip(self.models, jax.random.split(key, len(self.models)))]

    def apply(self, params_list, x, decode: bool = True, train: bool = False):
        assert decode and not train, "ensembles are inference-only"
        preds = [m.apply(p, x)[0] for m, p in zip(self.models, params_list)]
        return jnp.concatenate(preds, axis=1), None


def load_yolo_torch(path, fuse: bool = True):
    """Generic ``attempt_load`` equivalent: reconstruct ANY YOLOv5 ``.pt``
    from its embedded architecture yaml (without executing pickle code) and
    import its weights.

    Returns (model, params, YoloCheckpoint).  The spec comes from the
    checkpoint's own yaml (reference Model.__init__ path, yolo.py:84-121);
    anchors come from the Detect buffer (AutoAnchor-evolved values survive),
    strides from the saved stride tensor.

    ``path`` may be a list of checkpoints (reference
    ``attempt_load(weights=[a, b, ...])``): returns a :class:`YoloEnsemble`,
    a list of per-model params, and the LAST checkpoint (whose names the
    reference adopts, experimental.py:115).
    """
    from lpr_tpu.weights.torch_ckpt import YoloCheckpoint

    if isinstance(path, (list, tuple)):
        if len(path) == 1:
            return load_yolo_torch(path[0], fuse=fuse)
        loaded = [load_yolo_torch(p, fuse=fuse) for p in path]
        models = [m for m, _, _ in loaded]
        return (YoloEnsemble(models), [p for _, p, _ in loaded],
                loaded[-1][2])

    ck = YoloCheckpoint(path)
    if not ck.yaml.get("backbone"):
        raise ValueError(f"{path}: no architecture yaml in checkpoint")

    def norm_rows(rows):
        return tuple(
            (r[0] if not isinstance(r[0], list) else list(r[0]),
             int(r[1]), str(r[2]), list(r[3]))
            for r in rows
        )

    spec = YoloSpec(
        nc=ck.nc,
        depth_multiple=float(ck.yaml.get("depth_multiple", 1.0)),
        width_multiple=float(ck.yaml.get("width_multiple", 1.0)),
        anchors=ck.yaml.get("anchors"),
        backbone=norm_rows(ck.yaml["backbone"]),
        head=norm_rows(ck.yaml["head"]),
        ch=int(ck.yaml.get("ch", 3)),
    )
    if ck.stride is not None:
        strides = tuple(int(s) for s in np.asarray(ck.stride).ravel())
    else:  # infer from number of Detect inputs (P3 up)
        nl = len(spec.head[-1][0])
        strides = tuple(8 * 2**i for i in range(nl))
    model = build_yolo(spec, ckpt_anchors=ck.anchors, strides=strides)
    params = model.import_torch(ck.state_dict, fuse=fuse)
    return model, params, ck


def load_char_ocr(path: str, fuse: bool = True):
    """Build + load the char OCR model from the shipped char.pt, or from a
    native ``.npz`` checkpoint produced by ``tools/train_char_ocr.py``
    (self-trained replacement for the reference weights)."""
    if str(path).endswith(".npz"):
        return load_char_ocr_npz(path)
    return load_yolo_torch(path, fuse=fuse)


def load_char_ocr_npz(path: str):
    """Load a self-trained char OCR checkpoint (char.pt architecture,
    ``char_ocr_spec``): flat params npz with the AutoAnchor-derived anchors
    stored under the ``__anchors__`` side key (grid units).

    Returns ``(model, params, ck)`` like :func:`load_yolo_torch`, with
    ``ck.names`` = the 36 OCR classes."""
    import types

    from lpr_tpu.weights.checkpoint import load_params

    data = np.load(path)
    anchors = (np.asarray(data["__anchors__"], np.float32)
               if "__anchors__" in data else None)
    model = build_yolo(char_ocr_spec(), ckpt_anchors=anchors, strides=(8,))
    params = model.init(jax.random.PRNGKey(0))
    params = load_params(path, params)
    from lpr_tpu.pipeline.chars import OCR_CLASSES
    ck = types.SimpleNamespace(names=list(OCR_CLASSES), yaml={}, path=path)
    return model, params, ck
