"""Parity tests for the fused Pallas YOLO front-end kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.ops.pallas.yolo_front import (
    front_fused,
    front_reference,
    pack_front_input,
    pack_front_weights,
)


def _rand_params(rng):
    def conv(k, ci, co, scale=0.3):
        return {
            "w": rng.randn(k, k, ci, co).astype(np.float32) * scale / (k * np.sqrt(ci)),
            "b": rng.randn(co).astype(np.float32) * 0.1,
        }

    p_stem = conv(3, 12, 32)
    p_down = conv(3, 32, 64)
    p_c3 = {
        "cv1": conv(1, 64, 32),
        "cv2": conv(1, 64, 32),
        "cv3": conv(1, 64, 64),
        "m": [{"cv1": conv(1, 32, 32), "cv2": conv(3, 32, 32)}],
    }
    return p_stem, p_down, p_c3


@pytest.mark.slow
def test_front_fused_matches_xla_reference():
    rng = np.random.RandomState(0)
    p_stem, p_down, p_c3 = _rand_params(rng)
    x = jnp.asarray(rng.rand(1, 368, 640, 12).astype(np.float32)
                    ).astype(jnp.bfloat16)

    ref = np.asarray(front_reference(x, p_stem, p_down, p_c3),
                     np.float32)
    w = pack_front_weights(p_stem, p_down, p_c3)
    xp = pack_front_input(x)
    got = np.asarray(front_fused(xp, w, interpret=True), np.float32)

    assert got.shape == ref.shape == (1, 184, 320, 64)
    # kernel computes bias+silu in f32 (vs the reference's bf16 silu), so
    # allow bf16-scale tolerance
    err = np.abs(got - ref)
    assert err.max() < 0.03, (err.max(), np.argwhere(err > 0.03)[:5])
    # interior exactness is tighter than the borders
    assert err[:, 2:-2, 2:-2, :].mean() < 0.004


@pytest.mark.slow
def test_front_pack_from_params_matches_model_layers():
    """front_pack_from_params + front_apply == running the model's first
    three layers directly (random-init yolov5s plate detector, BN folded
    by the packer)."""
    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.ops.pallas.yolo_front import (front_fused,
                                               front_pack_from_params,
                                               pack_front_input)
    from lpr_tpu.ops import nn as tnn

    model = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    params = model.init(jax.random.PRNGKey(0))
    packed = front_pack_from_params(model, params)
    assert packed is not None, "yolov5s front pattern must match"

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 736, 1280, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y_ref = x
    for l, p in zip(model.layers[:3], params[:3]):
        y_ref = l(p, y_ref)
    y_ref = np.asarray(y_ref, np.float32)

    z = tnn.pixel_unshuffle(x, 2)
    got = np.asarray(front_fused(pack_front_input(z), packed,
                                 interpret=True), np.float32)
    assert got.shape == y_ref.shape
    err = np.abs(got - y_ref)
    assert err.max() < 0.03, err.max()


def test_pack_front_frames_matches_s2d_pack():
    """The production frame packer (one fused transpose from raw frames,
    used by front_apply in the serving pipeline) must encode exactly the
    same quarter-grid layout as pack_front_input over an explicit
    pixel_unshuffle — pins the c*4+i*2+j S2D channel order."""
    from lpr_tpu.ops import nn as tnn
    from lpr_tpu.ops.pallas.yolo_front import pack_front_frames

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 736, 1280, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    a = np.asarray(pack_front_frames(x))
    b = np.asarray(pack_front_input(tnn.pixel_unshuffle(x, 2)))
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_front_pack_rejects_non_matching_model():
    from lpr_tpu.models.yolo import YoloSpec, build_yolo
    from lpr_tpu.ops.pallas.yolo_front import front_pack_from_params

    spec = YoloSpec(
        nc=2, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 10, 30, 30]],
        backbone=((-1, 1, "Conv", [16, 3, 2]), (-1, 1, "Conv", [32, 3, 2]),
                  (-1, 1, "C3", [32])),
        head=(([2], 1, "Detect", ["nc", "anchors"]),),
    )
    model = build_yolo(spec, strides=(8,))
    params = model.init(jax.random.PRNGKey(0))
    assert front_pack_from_params(model, params) is None
