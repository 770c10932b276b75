"""LPSR — license-plate super-resolution network, TPU-native.

Functional JAX re-design of the reference enhancer
(``my_models/lpsr.py:252-274``): a PixelUnshuffle/PixelShuffle AutoEncoder
feeding an RDN of residual-dense blocks interleaved with CSAR
channel/spatial-attention blocks, global feature fusion, and a sigmoid output
head.  1x scale, 192x32 RGB in, 1 (or 3) channel out.

Load-bearing reference quirks replicated exactly (SURVEY.md §2.1):

- **Shared CSAR**: ``RDN.__init__`` appends the *same* CSAR instance after
  every RDB (``my_models/lpsr.py:201-205``) and ``RDN.forward`` iterates only
  ``num_blocks`` entries of the length-``2*num_blocks`` list
  (``my_models/lpsr.py:220-222``).  With the production config
  (num_blocks=4) the executed graph is RDB0 -> CSAR -> RDB2 -> CSAR with one
  shared CSAR applied twice; rdbs[4..7] are dead weight.  We materialize only
  the executed blocks: params hold rdb[0], rdb[1] (=torch rdbs.2), and one
  shared ``csar``.
- **CA squaring**: ``ChannelAttention.forward`` returns ``x * mask`` and CSAR
  multiplies by ``x_in`` again (``my_models/lpsr.py:133-135,181-184``), so the
  CA branch is ``x_in**2 * mask``.
- AutoEncoder pads H,W up to multiples of 4 (``my_models/lpsr.py:107-111``);
  static-shape equivalent here.

Params are a nested dict pytree; ``lpsr_apply`` is pure and jit/vmap/pjit
friendly.  Weight import maps the shipped ``weights/best_model.pth`` exactly
(158 tensors / 310,277 params incl. dead blocks, which we drop).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import nn as tnn
from lpr_tpu.weights import convert as cv

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LPSRConfig:
    """Production config from reference ``inference/run.py:124`` /
    ``train/lpsr.py:122-129`` (hard-coded at every call site there; typed
    once here)."""

    num_channels: int = 3
    num_features: int = 32
    growth_rate: int = 16
    num_blocks: int = 4
    num_layers: int = 4
    out_channels: int = 1
    expansion: int = 4  # AutoEncoder channel expansion
    ae_kernel: int = 5

    @property
    def executed_rdbs(self) -> int:
        """Number of distinct RDBs actually executed (see shared-CSAR quirk):
        rdbs[0], rdbs[2], ... — i.e. ceil(num_blocks / 2)."""
        return (self.num_blocks + 1) // 2


# ---------------------------------------------------------------------------
# initializers (match torch defaults: kaiming-uniform a=sqrt(5) for conv)


def _conv_init(key, kh, kw, cin, cout, bias=True, groups=1):
    fan_in = cin // groups * kh * kw
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    p = {
        "w": jax.random.uniform(
            k1, (kh, kw, cin // groups, cout), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def _linear_init(key, cin, cout, bias=True):
    bound = float(np.sqrt(1.0 / cin))
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return p


def _conv(p, x, **kw):
    return tnn.conv2d(x, p["w"], p.get("b"), **kw)


# ---------------------------------------------------------------------------
# blocks


def _dconv_init(key, cin, cout, k):
    k1, k2 = jax.random.split(key)
    return {
        "dw": _conv_init(k1, k, k, cin, cin, groups=cin),
        "pw": _conv_init(k2, 1, 1, cin, cout),
    }


def _dconv(p, x):
    """Depthwise kxk + pointwise 1x1 (reference DConv, my_models/lpsr.py:8-28)."""
    x = tnn.depthwise_conv2d(x, p["dw"]["w"], p["dw"].get("b"))
    return _conv(p["pw"], x)


def _autoencoder_init(key, cfg: LPSRConfig):
    c = cfg.num_channels
    e = cfg.expansion * c
    ks = jax.random.split(key, 7)
    return {
        "conv_in": _conv_init(ks[0], 3, 3, c, e, bias=False),
        "enc0": _dconv_init(ks[1], e, e, cfg.ae_kernel),
        "enc1": _dconv_init(ks[2], e * 4, e, cfg.ae_kernel),
        "dec0": _dconv_init(ks[3], e * 4, e * 4, cfg.ae_kernel),
        "dec1": _dconv_init(ks[4], e, e * 4, cfg.ae_kernel),
        "conv_out": _conv_init(ks[5], 3, 3, e, c, bias=False),
    }


def _autoencoder(p, x):
    """Reference AutoEncoder forward (my_models/lpsr.py:106-117)."""
    n, h, w, c = x.shape
    ph = (4 - h % 4) % 4
    pw = (4 - w % 4) % 4
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    conv_in = _conv(p["conv_in"], x)
    y = _dconv(p["enc0"], conv_in)
    y = tnn.relu(tnn.pixel_unshuffle(y, 2))
    y = _dconv(p["enc1"], y)
    y = tnn.relu(tnn.pixel_unshuffle(y, 2))
    y = _dconv(p["dec0"], y)
    y = tnn.relu(tnn.pixel_shuffle(y, 2))
    y = _dconv(p["dec1"], y)
    y = tnn.relu(tnn.pixel_shuffle(y, 2))
    out = conv_in + y
    return _conv(p["conv_out"], out)


def _rdb_init(key, cfg: LPSRConfig):
    nf, g = cfg.num_features, cfg.growth_rate
    ks = jax.random.split(key, cfg.num_layers + 1)
    layers = [
        _conv_init(ks[i], 3, 3, nf + g * i, g) for i in range(cfg.num_layers)
    ]
    return {
        "layers": layers,
        "lff": _conv_init(ks[-1], 1, 1, nf + g * cfg.num_layers, nf),
        "alpha": jnp.ones((), jnp.float32),
    }


def _rdb(p, x):
    """Residual dense block (my_models/lpsr.py:43-61): dense 3x3 convs with
    channel concat, 1x1 local feature fusion, learned residual scale alpha."""
    y = x
    for lp in p["layers"]:
        y = jnp.concatenate([y, tnn.relu(_conv(lp, y))], axis=-1)
    return x + p["alpha"].astype(x.dtype) * _conv(p["lff"], y)


def _csar_init(key, nf):
    ks = jax.random.split(key, 7)
    return {
        "conv_in0": _conv_init(ks[0], 3, 3, nf, nf),
        "conv_in1": _conv_init(ks[1], 3, 3, nf, nf),
        "ca_fc1": _linear_init(ks[2], nf, nf // 4),
        "ca_fc2": _linear_init(ks[3], nf // 4, nf),
        "sa_conv1": _conv_init(ks[4], 1, 1, nf, nf * 2),
        "sa_conv2": _conv_init(ks[5], 1, 1, nf * 2, nf),
        "conv_out": _conv_init(ks[6], 1, 1, nf * 2, nf),
    }


def _csar(p, x):
    """Channel & spatial attention residual block (my_models/lpsr.py:156-186).

    Note the CA branch squares x_in (reference quirk, see module docstring).
    """
    x_in = _conv(p["conv_in1"], tnn.relu(_conv(p["conv_in0"], x)))
    # channel attention: GAP -> fc -> relu -> fc -> sigmoid
    ca = tnn.global_avg_pool(x_in)  # (N, C)
    ca = tnn.linear(tnn.relu(tnn.linear(ca, p["ca_fc1"]["w"], p["ca_fc1"]["b"])),
                    p["ca_fc2"]["w"], p["ca_fc2"]["b"])
    ca = jax.nn.sigmoid(ca)[:, None, None, :]
    x_ca = x_in * ca  # ChannelAttention.forward returns x*mask ...
    # spatial attention: 1x1 expand -> relu -> 1x1 -> sigmoid (mask only)
    sa = jax.nn.sigmoid(_conv(p["sa_conv2"], tnn.relu(_conv(p["sa_conv1"], x_in))))
    # ... and CSAR multiplies by x_in again (x_in^2 * mask on the CA branch)
    y = jnp.concatenate([x_in * x_ca, x_in * sa], axis=-1)
    return x + _conv(p["conv_out"], y)


def _rdn_init(key, cfg: LPSRConfig):
    nf = cfg.num_features
    ks = jax.random.split(key, 5 + cfg.executed_rdbs)
    return {
        "shallowF1": _conv_init(ks[0], 7, 7, cfg.num_channels, nf),
        "shallowF2": _conv_init(ks[1], 3, 3, nf, nf),
        "csar": _csar_init(ks[2], nf),
        "rdbs": [_rdb_init(ks[5 + i], cfg) for i in range(cfg.executed_rdbs)],
        "gff0": _conv_init(ks[3], 1, 1, nf * cfg.num_blocks, nf),
        "gff1": _conv_init(ks[4], 3, 3, nf, nf),
    }


def _rdn(p, x, cfg: LPSRConfig):
    """RDN forward with the reference's half-list execution semantics
    (my_models/lpsr.py:214-225): alternating RDB / shared-CSAR for
    ``num_blocks`` steps, collecting every intermediate as a local feature."""
    sfe1 = _conv(p["shallowF1"], x)
    sfe2 = _conv(p["shallowF2"], sfe1)
    y = sfe2
    local_features = []
    for i in range(cfg.num_blocks):
        if i % 2 == 0:
            y = _rdb(p["rdbs"][i // 2], y)
        else:
            y = _csar(p["csar"], y)
        local_features.append(y)
    y = jnp.concatenate(local_features, axis=-1)
    y = _conv(p["gff1"], _conv(p["gff0"], y)) + sfe1
    return y


def lpsr_init(key, cfg: LPSRConfig = LPSRConfig()) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "auto_encoder": _autoencoder_init(k1, cfg),
        "rdn": _rdn_init(k2, cfg),
        "final_conv": _conv_init(k3, 3, 3, cfg.num_features, cfg.out_channels),
    }


def lpsr_apply(params: Params, x: jax.Array, cfg: LPSRConfig = LPSRConfig()) -> jax.Array:
    """Full LPSR forward (my_models/lpsr.py:269-274).

    x: (N, H, W, 3) in [0,1].  Returns (N, H, W, out_channels) in (0,1).
    """
    y = _autoencoder(params["auto_encoder"], x)
    y = _rdn(params["rdn"], y, cfg)
    y = _conv(params["final_conv"], y)
    return jax.nn.sigmoid(y)


# ---------------------------------------------------------------------------
# weight import


def _conv_from(sd, name, bias=True):
    p = {"w": cv.conv_w(sd[f"{name}.weight"])}
    if bias and f"{name}.bias" in sd:
        p["b"] = cv.vec(sd[f"{name}.bias"])
    return p


def _dconv_from(sd, name):
    return {
        "dw": {"w": cv.dw_conv_w(sd[f"{name}.dConv.0.weight"]),
               "b": cv.vec(sd[f"{name}.dConv.0.bias"])},
        "pw": _conv_from(sd, f"{name}.dConv.1"),
    }


def _rdb_from(sd, name, cfg: LPSRConfig):
    return {
        "layers": [
            _conv_from(sd, f"{name}.layers.{i}.conv") for i in range(cfg.num_layers)
        ],
        "lff": _conv_from(sd, f"{name}.lff"),
        "alpha": jnp.asarray(np.asarray(sd[f"{name}.alpha"], np.float32)),
    }


def _csar_from(sd, name):
    return {
        "conv_in0": _conv_from(sd, f"{name}.conv_in.0"),
        "conv_in1": _conv_from(sd, f"{name}.conv_in.2"),
        "ca_fc1": {"w": cv.linear_w(sd[f"{name}.ca.block.2.weight"]),
                   "b": cv.vec(sd[f"{name}.ca.block.2.bias"])},
        "ca_fc2": {"w": cv.linear_w(sd[f"{name}.ca.block.4.weight"]),
                   "b": cv.vec(sd[f"{name}.ca.block.4.bias"])},
        "sa_conv1": _conv_from(sd, f"{name}.sa.block.0"),
        "sa_conv2": _conv_from(sd, f"{name}.sa.block.2"),
        "conv_out": _conv_from(sd, f"{name}.conv_out"),
    }


def lpsr_from_torch(sd: Dict[str, np.ndarray], cfg: LPSRConfig = LPSRConfig()) -> Params:
    """Map the reference LPSR state dict (``weights/best_model.pth``) to our
    params, dropping dead rdbs[4..7] / duplicate shared-CSAR copies."""
    ae = {
        "conv_in": _conv_from(sd, "auto_encoder.conv_in", bias=False),
        "enc0": _dconv_from(sd, "auto_encoder.encoder.0"),
        "enc1": _dconv_from(sd, "auto_encoder.encoder.3"),
        "dec0": _dconv_from(sd, "auto_encoder.decoder.0"),
        "dec1": _dconv_from(sd, "auto_encoder.decoder.3"),
        "conv_out": _conv_from(sd, "auto_encoder.conv_out", bias=False),
    }
    rdn = {
        "shallowF1": _conv_from(sd, "rdn.shallowF1"),
        "shallowF2": _conv_from(sd, "rdn.shallowF2"),
        "csar": _csar_from(sd, "rdn.csar"),
        # executed RDBs live at even torch indices 0, 2, 4, ...
        "rdbs": [
            _rdb_from(sd, f"rdn.rdbs.{2 * i}", cfg)
            for i in range(cfg.executed_rdbs)
        ],
        "gff0": _conv_from(sd, "rdn.gff.0"),
        "gff1": _conv_from(sd, "rdn.gff.1"),
    }
    return {
        "auto_encoder": ae,
        "rdn": rdn,
        "final_conv": _conv_from(sd, "final_conv"),
    }


def load_lpsr(path: str, cfg: LPSRConfig = LPSRConfig()) -> Params:
    """Load LPSR weights from a torch .pth checkpoint, an exported .onnx
    graph (initializer names are torch names), or a native .npz."""
    if path.endswith(".onnx"):
        from lpr_tpu.weights.onnx_import import load_onnx

        return lpsr_from_torch(load_onnx(path)["initializers"], cfg)
    if path.endswith(".npz"):
        import jax

        from lpr_tpu.weights.checkpoint import load_params

        return load_params(path, lpsr_init(jax.random.PRNGKey(0), cfg))
    from lpr_tpu.weights.torch_ckpt import load_state_dict

    return lpsr_from_torch(load_state_dict(path), cfg)
