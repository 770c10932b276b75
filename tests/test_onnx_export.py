"""ONNX emit (reference my_utils/export_onnx.py:38-64 parity) + the
reference executor used to cross-validate graph semantics."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply, lpsr_init
from lpr_tpu.weights.onnx_export import export_lpsr_onnx
from lpr_tpu.weights.onnx_import import load_onnx
from lpr_tpu.weights.onnx_run import run_onnx

from .conftest import requires_ref

REF_ONNX = "/root/reference/onnx_models/sr/1/model.onnx"


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = LPSRConfig()
    params = lpsr_init(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path_factory.mktemp("onnx") / "lpsr.onnx")
    export_lpsr_onnx(params, path, cfg)
    return params, cfg, path


def test_roundtrip_import_parity(exported):
    """export -> import must reproduce every parameter bit-exactly."""
    params, cfg, path = exported
    p2 = load_lpsr(path, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_emitted_graph_contract(exported):
    """Same serving contract as the reference export: io names, dynamic
    axes, opset-16 ops, 64 weight initializers (the shipped artifact's
    count)."""
    _, _, path = exported
    d = load_onnx(path)
    assert d["inputs"] == ["input_image"]
    assert d["outputs"] == ["output_image"]
    weights = [k for k in d["initializers"]
               if d["initializers"][k].dtype != np.int64]
    assert len(weights) == 64
    ops = {n["op_type"] for n in d["nodes"]}
    assert ops <= {
        "Conv", "Relu", "Sigmoid", "Add", "Sub", "Mul", "Div", "Mod",
        "Concat", "Reshape", "Transpose", "DepthToSpace", "Gather", "Shape",
        "Pad", "Gemm", "Flatten", "GlobalAveragePool", "Unsqueeze",
    }


def test_emitted_graph_executes_like_lpsr_apply(exported):
    """Graph semantics (not just weights): the emitted ONNX evaluated by the
    reference executor must match lpsr_apply, including the dynamic
    pad-to-multiple-of-4 path and dynamic batch/H/W."""
    params, cfg, path = exported
    g = load_onnx(path)
    rng = np.random.RandomState(3)
    for shape in [(1, 3, 32, 192), (2, 3, 30, 190)]:  # second: H,W % 4 != 0
        x = rng.rand(*shape).astype(np.float32)
        y_onnx = run_onnx(g, {"input_image": x})[0]
        x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        y_jax = np.transpose(
            np.asarray(jax.jit(lambda p, v: lpsr_apply(p, v, cfg))(
                params, x_nhwc)), (0, 3, 1, 2))
        assert y_onnx.shape == y_jax.shape
        np.testing.assert_allclose(y_onnx, y_jax, atol=2e-6)


@requires_ref
@pytest.mark.skipif(not os.path.exists(REF_ONNX),
                    reason="reference onnx not mounted")
def test_executor_runs_shipped_torch_export(lpsr_golden):
    """The executor must reproduce the real torch-exported graph (incl.
    auto_pad=SAME_UPPER convs and the Reshape/Squeeze unshuffle chain)."""
    g = load_onnx(REF_ONNX)
    y = run_onnx(g, {"input_image": lpsr_golden["x"]})[0]
    np.testing.assert_allclose(y, lpsr_golden["y"], atol=1e-5)


@pytest.mark.skipif(shutil.which("protoc") is None, reason="protoc missing")
def test_wire_format_decodes_with_real_protobuf(exported):
    """Independent check that the hand-written wire format is valid protobuf
    per the public onnx schema (not just round-trippable by our own
    parser)."""
    _, _, path = exported
    proto = os.path.join(os.path.dirname(__file__), "..", "tools",
                         "onnx_subset.proto")
    with open(path, "rb") as f:
        r = subprocess.run(
            ["protoc", f"--proto_path={os.path.dirname(proto)}",
             "--decode=onnx.ModelProto", os.path.basename(proto)],
            stdin=f, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert 'op_type: "DepthToSpace"' in r.stdout
    assert 'producer_name: "lpr_tpu"' in r.stdout


# --------------------------------------------------------------------------
# YOLO detector emit (reference my_utils/export_onnx.py:66-99 surface)


def _yolo_emit_roundtrip(model, params, hw, x):
    import tempfile

    from lpr_tpu.weights.onnx_export import export_yolo_onnx

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "det.onnx")
        export_yolo_onnx(model, params, path, hw=hw)
        g = load_onnx(path)
    (pred_onnx,) = run_onnx(g, {"input_image": x})
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    pred_jax = np.asarray(
        jax.jit(lambda p, z: model.apply(p, z))(params, x_nhwc)[0])
    return pred_onnx, pred_jax


def test_yolo_onnx_emit_small_multiscale():
    """3-scale v6-stem model (Conv s2d stem, C3, SPPF, Upsample, Concat,
    Detect decode) emits and executes to JAX parity with dynamic batch."""
    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.ops import nn as tnn

    tnn.set_default_precision("highest")
    try:
        model = build_yolo(yolov5_spec(nc=4, depth=0.33, width=0.25),
                           strides=(8, 16, 32))
        params = model.init(jax.random.PRNGKey(0))
        x = np.random.RandomState(0).rand(2, 3, 96, 96).astype(np.float32)
        pred_onnx, pred_jax = _yolo_emit_roundtrip(model, params, (96, 96), x)
    finally:
        tnn.set_default_precision(None)
    assert pred_onnx.shape == pred_jax.shape
    # first axis dynamic: both batch entries present and distinct
    # (random-init outputs are bias-dominated, so compare exactly)
    assert not np.array_equal(pred_onnx[0], pred_onnx[1])
    np.testing.assert_allclose(pred_onnx, pred_jax, atol=1e-4)


@pytest.mark.slow
@requires_ref
def test_char_detector_onnx_emit_parity():
    """The real char.pt OCR graph (Focus, C3TR transformer, SPP, evolved
    2-anchor single-scale Detect) emits with the reference's serving
    contract (input_image -> predictions (B,512,41), decode in-graph) and
    executes to 1e-4 of model.apply."""
    from lpr_tpu.models.yolo import load_char_ocr
    from lpr_tpu.ops import nn as tnn

    tnn.set_default_precision("highest")
    try:
        model, params, _ = load_char_ocr("/root/reference/weights/char.pt")
        x = np.random.RandomState(1).rand(1, 3, 128, 128).astype(np.float32)
        pred_onnx, pred_jax = _yolo_emit_roundtrip(model, params,
                                                   (128, 128), x)
    finally:
        tnn.set_default_precision(None)
    assert pred_onnx.shape == (1, 512, 41)
    np.testing.assert_allclose(pred_onnx, pred_jax, atol=1e-4)
