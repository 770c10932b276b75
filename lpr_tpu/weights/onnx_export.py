"""Dependency-free ONNX graph emitter + LPSR exporter.

The reference exports all of its models to ONNX with dynamic axes for
Triton serving (``my_utils/export_onnx.py:38-64``: LPSR with
``input_names=["input_image"]``, ``output_names=["output_image"]``,
opset 16, dynamic batch/height/width).  No onnx package ships in this
environment, so this module writes the protobuf wire format directly
(field numbers per the public onnx.proto schema); the graph reproduces
``lpsr_apply`` in NCHW with initializers under the reference's torch
state-dict names, so both our importer (:mod:`lpr_tpu.weights.onnx_import`)
and the reference's onnxruntime serving stack can consume the artifact.

Graph notes (mirrors what torch.onnx emits for the same model):

- the mult-of-4 AutoEncoder pad is dynamic: Shape -> Gather -> Mod -> Pad;
- PixelUnshuffle is a Reshape/Transpose/Reshape chain with shape math (ONNX
  SpaceToDepth has the wrong channel order for torch semantics);
- PixelShuffle is DepthToSpace mode="CRD" (exactly torch's order);
- the shared CSAR (SURVEY.md §2.1 quirk) appears twice in the node list but
  references one set of ``rdn.csar.*`` initializers.
"""

from __future__ import annotations

import struct
from typing import Any, List, Optional, Sequence, Union

import numpy as np

# --------------------------------------------------------------------------
# protobuf wire-format writers

_F32, _I64 = 1, 7  # onnx TensorProto.DataType


def _vint(v: int) -> bytes:
    v &= (1 << 64) - 1
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _f_msg(num: int, payload: bytes) -> bytes:
    """Length-delimited field (messages, strings, bytes, packed)."""
    return _vint((num << 3) | 2) + _vint(len(payload)) + payload


def _f_str(num: int, s: str) -> bytes:
    return _f_msg(num, s.encode("utf-8"))


def _f_int(num: int, v: int) -> bytes:
    return _vint((num << 3) | 0) + _vint(v)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto: dims=1, data_type=2, int64_data=7, name=8, raw_data=9."""
    arr = np.asarray(arr)
    if arr.dtype == np.int64:
        dt, raw = _I64, arr.astype("<i8").tobytes()
    else:
        dt, raw = _F32, arr.astype("<f4").tobytes()
    out = b"".join(_f_int(1, int(d)) for d in arr.shape)
    out += _f_int(2, dt)
    out += _f_str(8, name)
    out += _f_msg(9, raw)
    return out


def _attr(name: str, *, i: Optional[int] = None, f: Optional[float] = None,
          s: Optional[str] = None,
          ints: Optional[Sequence[int]] = None) -> bytes:
    """AttributeProto: name=1, f=2, i=3, s=4, ints=8, type=20."""
    out = _f_str(1, name)
    if i is not None:
        out += _f_int(3, int(i)) + _f_int(20, 2)            # INT
    elif f is not None:
        out += _vint((2 << 3) | 5) + struct.pack("<f", f) + _f_int(20, 1)
    elif s is not None:
        out += _f_msg(4, s.encode("utf-8")) + _f_int(20, 3)  # STRING
    elif ints is not None:
        out += b"".join(_f_int(8, int(v)) for v in ints) + _f_int(20, 7)
    return out


def _node(op: str, inputs: Sequence[str], outputs: Sequence[str],
          name: str = "", attrs: Sequence[bytes] = ()) -> bytes:
    """NodeProto: input=1, output=2, name=3, op_type=4, attribute=5."""
    out = b"".join(_f_str(1, x) for x in inputs)
    out += b"".join(_f_str(2, x) for x in outputs)
    if name:
        out += _f_str(3, name)
    out += _f_str(4, op)
    out += b"".join(_f_msg(5, a) for a in attrs)
    return out


def _value_info(name: str, dims: Sequence[Union[int, str]],
                elem_type: int = _F32) -> bytes:
    """ValueInfoProto(name=1, type=2) / TypeProto.tensor_type=1 /
    Tensor(elem_type=1, shape=2) / TensorShapeProto.dim=1 /
    Dimension(dim_value=1, dim_param=2)."""
    dim_msgs = b"".join(
        _f_msg(1, _f_int(1, d) if isinstance(d, int) else _f_str(2, d))
        for d in dims
    )
    tensor = _f_int(1, elem_type) + _f_msg(2, dim_msgs)
    return _f_str(1, name) + _f_msg(2, _f_msg(1, tensor))


class OnnxGraph:
    """Tiny graph builder: add nodes/initializers, serialize a ModelProto."""

    def __init__(self, name: str = "lpr_tpu"):
        self.name = name
        self.nodes: List[bytes] = []
        self.inits: List[bytes] = []
        self._init_names: set = set()
        self._n = 0

    # -- construction ------------------------------------------------------
    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def init_tensor(self, name: str, arr: np.ndarray) -> str:
        if name not in self._init_names:  # shared weights emit once
            self._init_names.add(name)
            self.inits.append(_tensor(name, arr))
        return name

    def const_i64(self, values: Sequence[int], name: Optional[str] = None
                  ) -> str:
        name = name or self.fresh("ci64")
        return self.init_tensor(name, np.asarray(values, np.int64))

    def op(self, op: str, inputs: Sequence[str], n_out: int = 1,
           attrs: Sequence[bytes] = (), out: Optional[str] = None):
        outs = [out or self.fresh(op.lower())] if n_out == 1 else [
            self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(_node(op, inputs, outs,
                                name=self.fresh(f"n_{op}"), attrs=attrs))
        return outs[0] if n_out == 1 else outs

    # -- serialization -----------------------------------------------------
    def serialize(self, inputs: Sequence[bytes], outputs: Sequence[bytes],
                  opset: int = 16, ir_version: int = 8,
                  producer: str = "lpr_tpu") -> bytes:
        """GraphProto: node=1, name=2, initializer=5, input=11, output=12.
        ModelProto: ir_version=1, producer_name=2, graph=7, opset_import=8."""
        g = b"".join(_f_msg(1, n) for n in self.nodes)
        g += _f_str(2, self.name)
        g += b"".join(_f_msg(5, t) for t in self.inits)
        g += b"".join(_f_msg(11, v) for v in inputs)
        g += b"".join(_f_msg(12, v) for v in outputs)
        model = _f_int(1, ir_version)
        model += _f_str(2, producer)
        model += _f_msg(7, g)
        model += _f_msg(8, _f_str(1, "") + _f_int(2, opset))
        return model


# --------------------------------------------------------------------------
# LPSR graph


def _to_oihw(w) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1)))


class _LpsrEmitter:
    def __init__(self, params: Any, cfg):
        self.g = OnnxGraph("lpsr")
        self.p = params
        self.cfg = cfg

    # conv with torch-named weights; p = {"w": HWIO, "b"?}
    def conv(self, x: str, name: str, p, k: int, groups: int = 1,
             dw: bool = False) -> str:
        g = self.g
        w = np.asarray(p["w"], np.float32)
        if dw:
            # our depthwise layout (k, k, 1, C) -> torch (C, 1, k, k)
            w_t = np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
        else:
            w_t = _to_oihw(w)
        ins = [x, g.init_tensor(f"{name}.weight", w_t)]
        if "b" in p:
            ins.append(g.init_tensor(f"{name}.bias",
                                     np.asarray(p["b"], np.float32)))
        pad = k // 2
        return g.op("Conv", ins, attrs=[
            _attr("dilations", ints=[1, 1]),
            _attr("group", i=groups),
            _attr("kernel_shape", ints=[k, k]),
            _attr("pads", ints=[pad, pad, pad, pad]),
            _attr("strides", ints=[1, 1]),
        ])

    def dconv(self, x: str, name: str, p, cin: int) -> str:
        y = self.conv(x, f"{name}.dConv.0", p["dw"], self.cfg.ae_kernel,
                      groups=cin, dw=True)
        return self.conv(y, f"{name}.dConv.1", p["pw"], 1)

    def pixel_unshuffle(self, x: str, r: int = 2) -> str:
        """torch PixelUnshuffle: (N,C,H,W)->(N,C*r^2,H/r,W/r), C-major
        channel order — Reshape/Transpose/Reshape with dynamic shape math."""
        g = self.g
        shape = g.op("Shape", [x])
        n = g.op("Gather", [shape, g.const_i64([0])], attrs=[_attr("axis", i=0)])
        c = g.op("Gather", [shape, g.const_i64([1])], attrs=[_attr("axis", i=0)])
        h = g.op("Gather", [shape, g.const_i64([2])], attrs=[_attr("axis", i=0)])
        w = g.op("Gather", [shape, g.const_i64([3])], attrs=[_attr("axis", i=0)])
        rr = g.const_i64([r])
        h2 = g.op("Div", [h, rr])
        w2 = g.op("Div", [w, rr])
        tgt1 = g.op("Concat", [n, c, h2, rr, w2, rr], attrs=[_attr("axis", i=0)])
        y = g.op("Reshape", [x, tgt1])
        y = g.op("Transpose", [y], attrs=[_attr("perm", ints=[0, 1, 3, 5, 2, 4])])
        c4 = g.op("Mul", [c, g.const_i64([r * r])])
        tgt2 = g.op("Concat", [n, c4, h2, w2], attrs=[_attr("axis", i=0)])
        return g.op("Reshape", [y, tgt2])

    def pixel_shuffle(self, x: str, r: int = 2) -> str:
        return self.g.op("DepthToSpace", [x], attrs=[
            _attr("blocksize", i=r), _attr("mode", s="CRD")])

    # -- blocks -------------------------------------------------------------
    def autoencoder(self, x: str) -> str:
        g, cfg = self.g, self.cfg
        ap = self.p["auto_encoder"]
        e = cfg.expansion * cfg.num_channels
        # dynamic pad of H, W up to multiples of 4 (my_models/lpsr.py:107-111)
        shape = g.op("Shape", [x])
        hw = g.op("Gather", [shape, g.const_i64([2, 3])],
                  attrs=[_attr("axis", i=0)])
        four = g.const_i64([4, 4])
        rem = g.op("Mod", [hw, four])
        pad_amt = g.op("Mod", [g.op("Sub", [four, rem]), four])
        pads = g.op("Concat", [g.const_i64([0] * 6), pad_amt],
                    attrs=[_attr("axis", i=0)])
        xp = g.op("Pad", [x, pads])
        conv_in = self.conv(xp, "auto_encoder.conv_in", ap["conv_in"], 3)
        y = self.dconv(conv_in, "auto_encoder.encoder.0", ap["enc0"], e)
        y = g.op("Relu", [self.pixel_unshuffle(y)])
        y = self.dconv(y, "auto_encoder.encoder.3", ap["enc1"], e * 4)
        y = g.op("Relu", [self.pixel_unshuffle(y)])
        y = self.dconv(y, "auto_encoder.decoder.0", ap["dec0"], e * 4)
        y = g.op("Relu", [self.pixel_shuffle(y)])
        y = self.dconv(y, "auto_encoder.decoder.3", ap["dec1"], e)
        y = g.op("Relu", [self.pixel_shuffle(y)])
        out = g.op("Add", [conv_in, y])
        return self.conv(out, "auto_encoder.conv_out", ap["conv_out"], 3)

    def rdb(self, x: str, name: str, p) -> str:
        g = self.g
        y = x
        for i, lp in enumerate(p["layers"]):
            c = g.op("Relu", [self.conv(y, f"{name}.layers.{i}.conv", lp, 3)])
            y = g.op("Concat", [y, c], attrs=[_attr("axis", i=1)])
        lff = self.conv(y, f"{name}.lff", p["lff"], 1)
        alpha = g.init_tensor(f"{name}.alpha",
                              np.asarray(p["alpha"], np.float32).reshape(()))
        return g.op("Add", [x, g.op("Mul", [lff, alpha])])

    def gemm(self, x: str, name: str, p) -> str:
        g = self.g
        w = g.init_tensor(f"{name}.weight",
                          np.ascontiguousarray(np.asarray(p["w"], np.float32).T))
        b = g.init_tensor(f"{name}.bias", np.asarray(p["b"], np.float32))
        return g.op("Gemm", [x, w, b], attrs=[
            _attr("alpha", f=1.0), _attr("beta", f=1.0),
            _attr("transB", i=1)])

    def csar(self, x: str, p) -> str:
        g = self.g
        name = "rdn.csar"
        x_in = self.conv(
            g.op("Relu", [self.conv(x, f"{name}.conv_in.0", p["conv_in0"], 3)]),
            f"{name}.conv_in.2", p["conv_in1"], 3)
        # channel attention (note the reference's x_in^2 * mask quirk)
        ca = g.op("Flatten", [g.op("GlobalAveragePool", [x_in])],
                  attrs=[_attr("axis", i=1)])
        ca = self.gemm(ca, f"{name}.ca.block.2", p["ca_fc1"])
        ca = self.gemm(g.op("Relu", [ca]), f"{name}.ca.block.4", p["ca_fc2"])
        ca = g.op("Sigmoid", [ca])
        ca = g.op("Unsqueeze", [ca, g.const_i64([2, 3])])
        x_ca = g.op("Mul", [x_in, ca])
        sa = g.op("Relu", [self.conv(x_in, f"{name}.sa.block.0",
                                     p["sa_conv1"], 1)])
        sa = g.op("Sigmoid", [self.conv(sa, f"{name}.sa.block.2",
                                        p["sa_conv2"], 1)])
        y = g.op("Concat", [g.op("Mul", [x_in, x_ca]),
                            g.op("Mul", [x_in, sa])],
                 attrs=[_attr("axis", i=1)])
        return g.op("Add", [x, self.conv(y, f"{name}.conv_out",
                                         p["conv_out"], 1)])

    def build(self) -> bytes:
        g, cfg = self.g, self.cfg
        x = "input_image"
        y = self.autoencoder(x)
        r = self.p["rdn"]
        sfe1 = self.conv(y, "rdn.shallowF1", r["shallowF1"], 7)
        sfe2 = self.conv(sfe1, "rdn.shallowF2", r["shallowF2"], 3)
        y = sfe2
        local_features = []
        for i in range(cfg.num_blocks):
            if i % 2 == 0:
                y = self.rdb(y, f"rdn.rdbs.{2 * (i // 2)}",
                             r["rdbs"][i // 2])
            else:
                y = self.csar(y, r["csar"])
            local_features.append(y)
        y = g.op("Concat", local_features, attrs=[_attr("axis", i=1)])
        y = self.conv(y, "rdn.gff.0", r["gff0"], 1)
        y = g.op("Add", [self.conv(y, "rdn.gff.1", r["gff1"], 3), sfe1])
        y = self.conv(y, "final_conv", self.p["final_conv"], 3)
        g.op("Sigmoid", [y], out="output_image")
        # dynamic axes exactly as the reference exporter names them
        vin = _value_info("input_image",
                          ["batch_size", cfg.num_channels, "height", "width"])
        vout = _value_info("output_image",
                           ["batch_size", cfg.out_channels, "height", "width"])
        return g.serialize([vin], [vout], opset=16)


def export_lpsr_onnx(params: Any, path: str, cfg=None) -> None:
    """Serialize native LPSR params as a reference-compatible model.onnx
    (same input/output names, opset, dynamic axes, and initializer naming as
    the shipped ``onnx_models/sr/1/model.onnx``)."""
    from lpr_tpu.models.lpsr import LPSRConfig

    cfg = cfg or LPSRConfig()
    data = _LpsrEmitter(params, cfg).build()
    with open(path, "wb") as f:
        f.write(data)
