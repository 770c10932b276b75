"""Core NHWC neural-net ops for TPU.

Everything here is layout-native for TPU: activations are NHWC, conv weights
are HWIO, and channel dims sit in the minor (lane) dimension so XLA tiles
matmuls/convs onto the MXU.  Padding follows *PyTorch explicit-pad* semantics
(symmetric ``k//2``) rather than XLA ``SAME`` so imported reference weights
(reference ``yolov5/models/common.py:30-34`` ``autopad``) are bit-compatible
for even strides.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
PadLike = Union[str, int, Tuple[int, int], Sequence[Tuple[int, int]]]

# ---------------------------------------------------------------------------
# Precision policy.  On TPU the MXU ingests bf16 by default; that is the
# production fast path.  Parity tests against fp32 reference outputs set
# 'highest' (full fp32 accumulation via multiple bf16 passes).
_DEFAULT_PRECISION = [None]


def set_default_precision(p):
    """Set global matmul/conv precision: None (fast bf16 MXU), 'high',
    or 'highest' (fp32-exact)."""
    _DEFAULT_PRECISION[0] = p


class precision_scope:
    """Context manager: with precision_scope('highest'): ..."""

    def __init__(self, p):
        self.p = p

    def __enter__(self):
        self.prev = _DEFAULT_PRECISION[0]
        _DEFAULT_PRECISION[0] = self.p

    def __exit__(self, *a):
        _DEFAULT_PRECISION[0] = self.prev


def default_precision():
    return _DEFAULT_PRECISION[0]


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _resolve_padding(padding: PadLike, kh: int, kw: int):
    """Torch-style padding resolution.

    - ``'same'`` -> symmetric ``k//2`` per dim (matches torch ``padding='same'``
      for odd kernels and YOLO's ``autopad``).
    - int / (ph, pw) -> symmetric explicit padding.
    - ((t, b), (l, r)) -> fully explicit.
    """
    if isinstance(padding, str):
        p = padding.lower()
        if p == "same":
            return ((kh // 2, kh // 2), (kw // 2, kw // 2))
        if p == "valid":
            return ((0, 0), (0, 0))
        raise ValueError(f"unknown padding {padding!r}")
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    if isinstance(padding, (tuple, list)):
        if len(padding) == 2 and all(isinstance(x, int) for x in padding):
            ph, pw = padding
            return ((ph, ph), (pw, pw))
        return tuple((int(a), int(b)) for a, b in padding)
    raise ValueError(f"bad padding {padding!r}")


_CONV_DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def conv2d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: PadLike = "same",
    groups: int = 1,
    dilation: Union[int, Tuple[int, int]] = 1,
    precision=None,
) -> Array:
    """2-D convolution, NHWC x HWIO -> NHWC (torch padding semantics)."""
    kh, kw = int(w.shape[0]), int(w.shape[1])
    pad = _resolve_padding(padding, kh, kw)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=_pair(stride),
        padding=pad,
        rhs_dilation=_pair(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision if precision is not None else _DEFAULT_PRECISION[0],
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def quantize_conv_weight(w) -> Tuple[Array, Array]:
    """Symmetric per-output-channel int8 quantization of an HWIO conv
    weight: returns (int8 weight, float32 per-Cout scale)."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))  # (Cout,)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def conv2d_int8(
    x: Array,
    w_q: Array,
    w_scale: Array,
    b: Optional[Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: PadLike = "same",
    groups: int = 1,
) -> Array:
    """Dynamically-quantized int8 convolution.

    Activations are quantized symmetrically per tensor with a scale computed
    on the fly (max|x|/127 — no calibration pass needed); weights are int8
    with per-output-channel scales from :func:`quantize_conv_weight`.  The
    conv itself runs int8 x int8 -> int32 on the MXU (2x the bf16 peak on
    v5e/v6), then dequantizes + bias in float.  Zero padding is exact: 0 in
    the quantized domain is 0.0 real (symmetric quant).
    """
    kh, kw = int(w_q.shape[0]), int(w_q.shape[1])
    pad = _resolve_padding(padding, kh, kw)
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sx = jnp.maximum(ax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        w_q,
        window_strides=_pair(stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (sx * w_scale)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def depthwise_conv2d(x, w, b=None, *, stride=1, padding="same", dilation=1):
    """Depthwise conv: ``w`` is HWIO with I=1, O=C (torch groups=C layout
    converted by :mod:`lpr_tpu.weights.convert`)."""
    return conv2d(
        x, w, b, stride=stride, padding=padding, groups=x.shape[-1], dilation=dilation
    )


def linear(x: Array, w: Array, b: Optional[Array] = None, precision=None) -> Array:
    """Dense layer; ``w`` is (in, out) — transposed from torch's (out, in)."""
    out = jnp.dot(
        x,
        w.astype(x.dtype),
        precision=precision if precision is not None else _DEFAULT_PRECISION[0],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def batch_norm(x, gamma, beta, mean, var, eps: float = 1e-3):
    """Inference batch norm (torch BatchNorm2d default eps=1e-3 in YOLO)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return x * scale.astype(x.dtype) + (beta - mean * scale).astype(x.dtype)


def fuse_conv_bn(w, b, gamma, beta, mean, var, eps: float = 1e-3):
    """Fold BN into conv weights, mirroring reference
    ``yolov5/utils/torch_utils.py:207-227`` (``fuse_conv_and_bn``) but in
    HWIO numpy space at import time."""
    w = np.asarray(w, np.float32)
    scale = np.asarray(gamma, np.float32) / np.sqrt(np.asarray(var, np.float32) + eps)
    w_f = w * scale.reshape(1, 1, 1, -1)
    b0 = np.zeros(w.shape[-1], np.float32) if b is None else np.asarray(b, np.float32)
    b_f = (b0 - np.asarray(mean, np.float32)) * scale + np.asarray(beta, np.float32)
    return w_f, b_f


def silu(x: Array) -> Array:
    """SiLU with subnormal flush.

    Trained backbones drive many pre-activations deeply negative; the raw
    ``x * sigmoid(x)`` tail then emits subnormal floats, and convolutions
    consuming subnormal inputs run ~60% slower on TPU v5e (measured
    38 -> 61 ms/step on the trained plate detector @736x1280 batch 32;
    flushing restores 38 ms).  Values below 1e-30 are numerically
    meaningless for NN activations, so flush them to exact zero — max
    absolute output change 1e-30, far below bf16 activation resolution."""
    y = x * jax.nn.sigmoid(x)
    return jnp.where(jnp.abs(y) < jnp.asarray(1e-30, y.dtype),
                     jnp.zeros((), y.dtype), y)


def relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: Array, slope: float = 0.2) -> Array:
    return jnp.where(x >= 0, x, slope * x)


def sigmoid(x: Array) -> Array:
    return jax.nn.sigmoid(x)


def tanh(x: Array) -> Array:
    return jnp.tanh(x)


def mish(x: Array) -> Array:
    """x * tanh(softplus(x)) (reference utils/activations.py Mish)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def hardswish(x: Array) -> Array:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def frelu_like(x: Array) -> Array:  # simple funnel-act stand-in
    return jnp.maximum(x, 0)


ACTIVATIONS = {
    "silu": silu, "relu": relu, "leaky": leaky_relu, "mish": mish,
    "hardswish": hardswish, "sigmoid": sigmoid, "tanh": tanh,
    "none": lambda x: x,
}
"""Activation zoo (reference yolov5/utils/activations.py)."""


def max_pool2d(x: Array, k: int, stride: int = 1, padding: Optional[int] = None):
    """Max pool with torch semantics (symmetric explicit pad, -inf fill)."""
    if padding is None:
        padding = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(x: Array, k: int, stride: int = 1, padding: int = 0):
    s = jax.lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return s / (k * k)


def global_avg_pool(x: Array) -> Array:
    """(N,H,W,C) -> (N,C)  — torch AdaptiveAvgPool2d(1)+Flatten."""
    return jnp.mean(x, axis=(1, 2))


def pixel_unshuffle(x: Array, r: int) -> Array:
    """Space-to-depth with torch PixelUnshuffle channel ordering.

    torch (NCHW): out[:, c*r*r + i*r + j, h, w] = in[:, c, h*r+i, w*r+j]
    (reference ``my_models/lpsr.py:72,79``).  NHWC equivalent below keeps the
    identical channel index order so imported weights line up.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h', w', c, i, j
    return x.reshape(n, h // r, w // r, c * r * r)


def pixel_shuffle(x: Array, r: int) -> Array:
    """Depth-to-space, inverse of :func:`pixel_unshuffle` (torch order)."""
    n, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(n, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, co
    return x.reshape(n, h * r, w * r, co)


def space_to_depth_focus(x: Array) -> Array:
    """YOLO ``Focus`` slicing (reference ``yolov5/models/common.py:199-207``):
    concat of x[::2,::2], x[1::2,::2], x[::2,1::2], x[1::2,1::2] on channels.
    Pure gather/reshape — free on TPU relative to the following conv."""
    return jnp.concatenate(
        [
            x[:, ::2, ::2, :],
            x[:, 1::2, ::2, :],
            x[:, ::2, 1::2, :],
            x[:, 1::2, 1::2, :],
        ],
        axis=-1,
    )


def upsample_nearest(x: Array, scale: int = 2) -> Array:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """InstanceNorm2d with torch defaults (affine=False).  Per-sample,
    per-channel normalization over H,W (reference ``my_models/cycle_gans.py``)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def reflect_pad2d(x: Array, pad: int) -> Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
