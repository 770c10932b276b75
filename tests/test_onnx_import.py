"""ONNX importer tests (oracle: shipped onnx_models/sr/1/model.onnx)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_ONNX = "/root/reference/onnx_models/sr/1/model.onnx"

requires_onnx = pytest.mark.skipif(
    not os.path.exists(REF_ONNX), reason="reference onnx not mounted"
)


@requires_onnx
def test_load_onnx_structure():
    from lpr_tpu.weights.onnx_import import load_onnx

    d = load_onnx(REF_ONNX)
    assert d["inputs"] == ["input_image"]    # config.pbtxt contract
    assert d["outputs"] == ["output_image"]
    assert len(d["initializers"]) == 64
    ops = {n["op_type"] for n in d["nodes"]}
    assert {"Conv", "Relu", "Sigmoid", "Concat"} <= ops


@requires_onnx
def test_onnx_initializers_match_torch_ckpt():
    from lpr_tpu.weights.onnx_import import load_onnx
    from lpr_tpu.weights.torch_ckpt import load_state_dict

    init = load_onnx(REF_ONNX)["initializers"]
    sd = load_state_dict("/root/reference/weights/best_model.pth")
    same = sum(
        1 for k, v in init.items()
        if k in sd and v.shape == sd[k].shape and np.allclose(v, sd[k])
    )
    assert same >= 60  # ONNX export keeps torch names + values


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


def _field(num: int, wt: int, payload: bytes) -> bytes:
    key = _vint((num << 3) | wt)
    if wt == 2:
        return key + _vint(len(payload)) + payload
    return key + payload


def test_negative_int64_initializers(tmp_path):
    """Protobuf encodes negative int64 as 10-byte two's-complement varints;
    the parser must sign-extend them (round-1 advisor finding: -1 parsed as
    2**64-1 and overflowed np.int64)."""
    from lpr_tpu.weights.onnx_import import load_onnx

    tensor = (
        _field(8, 2, b"neg")            # name
        + _field(1, 0, _vint(3))        # dims = [3]
        + _field(2, 0, _vint(7))        # data_type = INT64
        + _field(7, 0, _vint(1))        # int64_data
        + _field(7, 0, _vint(-1))
        + _field(7, 0, _vint(-1280))
    )
    model = _field(7, 2, _field(5, 2, tensor))  # ModelProto.graph.initializer
    p = tmp_path / "neg.onnx"
    p.write_bytes(model)
    init = load_onnx(str(p))["initializers"]
    np.testing.assert_array_equal(init["neg"], np.asarray([1, -1, -1280]))
    assert init["neg"].dtype == np.int64


@requires_onnx
def test_lpsr_from_onnx_forward_matches_pth(lpsr_golden):
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply

    cfg = LPSRConfig()
    p_onnx = load_lpsr(REF_ONNX, cfg)
    x = jnp.asarray(np.transpose(lpsr_golden["x"], (0, 2, 3, 1)))
    y = jax.jit(lambda p, x: lpsr_apply(p, x, cfg))(p_onnx, x)
    y_ref = np.transpose(lpsr_golden["y"], (0, 2, 3, 1))
    assert np.abs(np.asarray(y) - y_ref).max() < 1e-4
