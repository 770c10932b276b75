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


@requires_onnx
def test_lpsr_from_onnx_forward_matches_pth(lpsr_golden):
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply

    cfg = LPSRConfig()
    p_onnx = load_lpsr(REF_ONNX, cfg)
    x = jnp.asarray(np.transpose(lpsr_golden["x"], (0, 2, 3, 1)))
    y = jax.jit(lambda p, x: lpsr_apply(p, x, cfg))(p_onnx, x)
    y_ref = np.transpose(lpsr_golden["y"], (0, 2, 3, 1))
    assert np.abs(np.asarray(y) - y_ref).max() < 1e-4
