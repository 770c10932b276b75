"""Parity tests for the fused Pallas YOLO mid kernel (layers 3-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.ops.pallas.yolo_mid import (
    mid_fused,
    mid_geom,
    mid_reference,
    pack_mid_input,
    pack_mid_weights,
)


def _rand_params(rng):
    def conv(k, ci, co, scale=0.3):
        return {
            "w": rng.randn(k, k, ci, co).astype(np.float32)
            * scale / (k * np.sqrt(ci)),
            "b": rng.randn(co).astype(np.float32) * 0.1,
        }

    p_l3 = conv(3, 64, 128)
    p_c3 = {
        "cv1": conv(1, 128, 64),
        "cv2": conv(1, 128, 64),
        "cv3": conv(1, 128, 128),
        "m": [{"cv1": conv(1, 64, 64), "cv2": conv(3, 64, 64)},
              {"cv1": conv(1, 64, 64), "cv2": conv(3, 64, 64)}],
    }
    return p_l3, p_c3


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(184, 320), (64, 64)])
def test_mid_fused_matches_xla_reference(hw):
    """Bench geometry (rows not divisible by the strip: the masked last
    strip) and a small square geometry."""
    rng = np.random.RandomState(0)
    p_l3, p_c3 = _rand_params(rng)
    h, w = hw
    x = jnp.asarray(rng.rand(1, h, w, 64).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = np.asarray(mid_reference(x, p_l3, p_c3), np.float32)
    wts = pack_mid_weights(p_l3, p_c3)
    g = mid_geom(h, w)
    got = np.asarray(mid_fused(pack_mid_input(x), wts, geom=g,
                               interpret=True), np.float32)
    assert got.shape == ref.shape == (1, h // 2, w // 2, 128)
    err = np.abs(got - ref)
    assert err.max() < 0.05, (err.max(), np.argwhere(err > 0.05)[:5])
    assert err[:, 2:-2, 2:-2, :].mean() < 0.006


def test_mid_pack_from_params_matches_model_layers():
    """mid_pack_from_params + mid_apply == layers 3-4 of the yolov5s plate
    detector (random init, BN folded by the packer)."""
    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.ops.pallas.yolo_mid import mid_pack_from_params

    model = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    params = model.init(jax.random.PRNGKey(0))
    packed = mid_pack_from_params(model, params)
    assert packed is not None, "yolov5s layers 3-4 must match"

    rng = np.random.RandomState(1)
    y = jnp.asarray(rng.rand(1, 64, 96, 64).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y_ref = y
    for l, p in zip(model.layers[3:5], params[3:5]):
        y_ref = l(p, y_ref)
    y_ref = np.asarray(y_ref, np.float32)

    g = mid_geom(64, 96)
    got = np.asarray(mid_fused(pack_mid_input(y), packed, geom=g,
                               interpret=True), np.float32)
    assert got.shape == y_ref.shape
    err = np.abs(got - y_ref)
    assert err.max() < 0.05, err.max()


def test_mid_pack_rejects_non_matching():
    from lpr_tpu.models.yolo import build_yolo, char_ocr_spec
    from lpr_tpu.ops.pallas.yolo_mid import mid_pack_from_params

    model = build_yolo(char_ocr_spec(),
                       ckpt_anchors=np.ones((1, 2, 2), np.float32) * 2,
                       strides=(8,))
    params = model.init(jax.random.PRNGKey(0))
    # char OCR layer 3 is Conv(32->64), not the (64->128) mid pattern
    assert mid_pack_from_params(model, params) is None
