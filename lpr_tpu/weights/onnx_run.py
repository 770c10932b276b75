"""Reference executor for imported/emitted ONNX graphs.

Runs the op subset used by the project's three model families (the shipped
``onnx_models/sr/1/model.onnx``, our own :mod:`onnx_export` output, and
torch-exported YOLO graphs' common core).  Purpose: (a) cross-validate the
hand-written emitter's *graph semantics* against ``lpsr_apply`` — not just
its weights — and (b) let users holding the reference's ONNX artifacts
(``onnx_models/*/1/model.onnx``) execute them without onnxruntime, which
does not ship in this environment.

Not a general runtime: static single-assignment eval in topological (file)
order, fp32 numpy + lax convolutions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def _conv(x, w, b, attrs):
    import jax
    import jax.numpy as jnp
    from jax import lax

    strides = tuple(attrs.get("strides", [1, 1]))
    pads = attrs.get("pads", [0, 0, 0, 0])
    dil = tuple(attrs.get("dilations", [1, 1]))
    groups = int(attrs.get("group", 1))
    auto_pad = attrs.get("auto_pad", "NOTSET")
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        padding = []
        for ax in range(2):
            in_sz = x.shape[2 + ax]
            k_eff = (w.shape[2 + ax] - 1) * dil[ax] + 1
            out_sz = -(-in_sz // strides[ax])  # ceil
            total = max((out_sz - 1) * strides[ax] + k_eff - in_sz, 0)
            lo = total // 2 if auto_pad == "SAME_UPPER" else total - total // 2
            padding.append((lo, total - lo))
        padding = tuple(padding)
    else:
        padding = ((pads[0], pads[2]), (pads[1], pads[3]))
    y = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=strides,
        padding=padding,
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if b is not None:
        y = y + jnp.asarray(b, jnp.float32)[None, :, None, None]
    return np.asarray(y)


def _depth_to_space(x, blocksize, mode=b"DCR"):
    n, c, h, w = x.shape
    r = int(blocksize)
    mode = mode.decode() if isinstance(mode, bytes) else str(mode)
    if mode == "CRD":  # torch PixelShuffle order
        y = x.reshape(n, c // (r * r), r, r, h, w)
        y = y.transpose(0, 1, 4, 2, 5, 3)
    else:  # DCR
        y = x.reshape(n, r, r, c // (r * r), h, w)
        y = y.transpose(0, 3, 4, 1, 5, 2)
    return y.reshape(n, c // (r * r), h * r, w * r)


def _pad(x, pads, value=0.0):
    pads = np.asarray(pads, np.int64)
    k = len(pads) // 2
    widths = [(int(pads[i]), int(pads[i + k])) for i in range(k)]
    return np.pad(x, widths, constant_values=value)


def _slice(data, starts, ends, axes=None, steps=None):
    nd = data.ndim
    axes = list(range(nd)) if axes is None else [int(a) % nd for a in axes]
    steps = [1] * len(axes) if steps is None else [int(s) for s in steps]
    sl = [slice(None)] * nd
    for a, s, e, st in zip(axes, starts, ends, steps):
        sl[a] = slice(int(s), int(e), st)
    return data[tuple(sl)]


def run_onnx(graph: Dict[str, Any], feeds: Dict[str, np.ndarray],
             outputs: Optional[Sequence[str]] = None) -> List[np.ndarray]:
    """Evaluate ``load_onnx``'s dict form on ``feeds``; returns the graph
    outputs (or ``outputs`` if given)."""
    env: Dict[str, np.ndarray] = dict(graph["initializers"])
    env.update({k: np.asarray(v) for k, v in feeds.items()})

    def get(name):
        return env[name] if name else None

    for node in graph["nodes"]:
        op = node["op_type"]
        a = node["attrs"] if "attrs" in node else {}
        ins = node["inputs"]
        x = get(ins[0]) if ins else None
        if op == "Conv":
            y = _conv(x, get(ins[1]), get(ins[2]) if len(ins) > 2 else None, a)
        elif op == "Relu":
            y = np.maximum(x, 0)
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-np.asarray(x, np.float32)))
        elif op == "Add":
            y = x + get(ins[1])
        elif op == "Sub":
            y = x - get(ins[1])
        elif op == "Mul":
            y = x * get(ins[1])
        elif op == "Div":
            b = get(ins[1])
            y = (x // b if np.issubdtype(np.asarray(x).dtype, np.integer)
                 else x / b)
        elif op == "Mod":
            y = np.mod(x, get(ins[1]))
        elif op == "Concat":
            y = np.concatenate([get(i) for i in ins],
                               axis=int(a.get("axis", 0)))
        elif op == "Reshape":
            shape = [int(v) for v in get(ins[1])]
            y = np.asarray(x).reshape(
                [x.shape[i] if v == 0 else v for i, v in enumerate(shape)])
        elif op == "Transpose":
            y = np.transpose(x, a["perm"])
        elif op == "DepthToSpace":
            y = _depth_to_space(x, a["blocksize"], a.get("mode", "DCR"))
        elif op == "Gather":
            y = np.take(x, np.asarray(get(ins[1]), np.int64),
                        axis=int(a.get("axis", 0)))
        elif op == "Shape":
            y = np.asarray(np.asarray(x).shape, np.int64)
        elif op == "Pad":
            y = _pad(x, get(ins[1]),
                     float(get(ins[2])) if len(ins) > 2 and ins[2] else 0.0)
        elif op == "Gemm":
            w = get(ins[1])
            if int(a.get("transB", 0)):
                w = w.T
            y = (float(a.get("alpha", 1.0)) * (x @ w)
                 + float(a.get("beta", 1.0)) * get(ins[2]))
        elif op == "Flatten":
            ax = int(a.get("axis", 1))
            y = np.asarray(x).reshape(int(np.prod(x.shape[:ax]) or 1), -1)
        elif op == "GlobalAveragePool":
            y = np.asarray(x, np.float32).mean(axis=(2, 3), keepdims=True)
        elif op == "Unsqueeze":
            y = np.asarray(x)
            for ax in sorted(int(v) for v in
                             (get(ins[1]) if len(ins) > 1 else a["axes"])):
                y = np.expand_dims(y, ax)
        elif op == "Squeeze":
            axes = (get(ins[1]) if len(ins) > 1 else a.get("axes"))
            y = np.squeeze(x, tuple(int(v) for v in axes) if axes is not None
                           else None)
        elif op == "Slice":
            y = _slice(x, get(ins[1]), get(ins[2]),
                       get(ins[3]) if len(ins) > 3 else None,
                       get(ins[4]) if len(ins) > 4 else None)
        elif op == "Constant":
            y = a.get("value")
        elif op == "Identity":
            y = x
        elif op == "MatMul":
            y = np.asarray(x, np.float32) @ np.asarray(get(ins[1]), np.float32)
        elif op == "Softmax":
            ax = int(a.get("axis", -1))
            z = np.asarray(x, np.float32)
            z = z - z.max(axis=ax, keepdims=True)
            e = np.exp(z)
            y = e / e.sum(axis=ax, keepdims=True)
        elif op == "LeakyRelu":
            alpha = float(a.get("alpha", 0.01))
            y = np.where(x > 0, x, alpha * np.asarray(x, np.float32))
        elif op == "MaxPool":
            k = a["kernel_shape"]
            pads = a.get("pads", [0] * 4)
            st = a.get("strides", [1, 1])
            z = np.pad(np.asarray(x, np.float32),
                       ((0, 0), (0, 0), (pads[0], pads[2]),
                        (pads[1], pads[3])),
                       constant_values=-np.inf)
            n, c, h, w = z.shape
            oh = (h - k[0]) // st[0] + 1
            ow = (w - k[1]) // st[1] + 1
            s0, s1, s2, s3 = z.strides
            win = np.lib.stride_tricks.as_strided(
                z, (n, c, oh, ow, k[0], k[1]),
                (s0, s1, s2 * st[0], s3 * st[1], s2, s3), writeable=False)
            y = win.max(axis=(4, 5))
        elif op == "Resize":
            scales = get(ins[2]) if len(ins) > 2 and ins[2] else None
            mode = a.get("mode", b"nearest")
            mode = mode.decode() if isinstance(mode, bytes) else str(mode)
            assert mode == "nearest", f"Resize mode {mode}"
            y = np.asarray(x)
            for ax, sc in enumerate(np.asarray(scales, np.float32)):
                r = int(round(float(sc)))
                if r != 1:
                    y = np.repeat(y, r, axis=ax)
        else:
            raise NotImplementedError(f"onnx op {op}")
        env[node["outputs"][0]] = y

    wanted = list(outputs) if outputs is not None else graph["outputs"]
    return [env[n] for n in wanted]
