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


def test_pack_front_frames_conv_exact():
    """The MXU pack (stride-4 identity conv, channel permutation + plane
    padding folded into the conv) must be BIT-exact vs the transpose pack
    at both the rect and square geometries — 0/1 taps accumulate exactly
    one term, so there is no tolerance."""
    from lpr_tpu.ops.pallas.yolo_front import (pack_front_frames,
                                               pack_front_frames_conv)

    rng = np.random.RandomState(11)
    for hw in ((736, 1280), (64, 64)):
        x = jnp.asarray(rng.rand(2, *hw, 3).astype(np.float32)
                        ).astype(jnp.bfloat16)
        a = np.asarray(pack_front_frames(x).astype(jnp.float32))
        b = np.asarray(pack_front_frames_conv(x).astype(jnp.float32))
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


@pytest.mark.slow
def test_front_fused_second_geometry():
    """The kernel is geometry-generic (FrontGeom), not hard-locked to
    736x1280: parity at a second (square-family) geometry."""
    from lpr_tpu.ops.pallas.yolo_front import front_geom

    rng = np.random.RandomState(5)
    p_stem, p_down, p_c3 = _rand_params(rng)
    h, w = 256, 640
    g = front_geom(h, w)
    x = jnp.asarray(rng.rand(1, h // 2, w // 2, 12).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = np.asarray(front_reference(x, p_stem, p_down, p_c3), np.float32)
    wts = pack_front_weights(p_stem, p_down, p_c3)
    got = np.asarray(front_fused(pack_front_input(x), wts, interpret=True,
                                 geom=g), np.float32)
    assert got.shape == ref.shape == (1, h // 4, w // 4, 64)
    err = np.abs(got - ref)
    assert err.max() < 0.03, err.max()


def test_front_geom_validation():
    from lpr_tpu.ops.pallas.yolo_front import front_geom

    g = front_geom(1280, 1280)   # the reference-parity square geometry
    assert (g.c3rows, g.cols, g.cp) == (320, 320, 384)
    assert g.nstrip * g.strip == g.c3rows
    for bad in [(730, 1280), (736, 1270), (100, 64)]:
        with pytest.raises(ValueError):
            front_geom(*bad)


@pytest.mark.slow
def test_rect_pipeline_matches_square():
    """Full-pipeline detection at rect 736x1280 must read the same plates
    as reference-parity square 1280x1280 (BENCHLOG's measurement-geometry
    claim, pinned)."""
    import os
    import random
    import sys

    import pytest as _pytest

    sys.path.insert(0, "/root/repo")
    if not (os.path.exists("checkpoints/demo_plate_s.npz")
            and os.path.exists("/root/reference/weights/char.pt")):
        _pytest.skip("demo/reference weights missing")
    from tools.synth_plates import random_plate_text, render_frame_with_plates

    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.models.yolo import build_yolo, load_char_ocr, yolov5_spec
    from lpr_tpu.pipeline.recognizer import PipelineConfig, PlateRecognizer
    from lpr_tpu.weights.checkpoint import load_params

    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    pp = load_params("checkpoints/demo_plate_s.npz",
                     plate.init(jax.random.PRNGKey(0)))
    char, cp, ck = load_char_ocr("/root/reference/weights/char.pt")
    lcfg = LPSRConfig()
    lp = load_lpsr("/root/reference/weights/best_model.pth", lcfg)

    rng = random.Random(7)
    frames = []
    texts = []
    for _ in range(2):
        t = random_plate_text(rng)
        # in-distribution plate size (~200 px wide, one-row; the demo
        # detector is trained on 80-220 px plates)
        frames.append(render_frame_with_plates(
            (720, 1280), [(t, False, (520, 330, 720, 382))], rng))
        texts.append(t)
    frames = np.stack(frames)

    results = {}
    for hw in [(736, 1280), (1280, 1280)]:
        rec = PlateRecognizer(
            plate, pp, char, cp, lp, lcfg,
            PipelineConfig(det_hw=hw, det_conf=0.5, dtype=jnp.float32),
            char_names=ck.names)
        results[hw] = rec.recognize(frames)
    def _lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                               prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    for b in range(2):
        # compare the top-scoring plate (low-conf spurious boxes on the
        # noise background legitimately differ with padding amount).  The
        # raw-OCR read must agree across geometries to <=1 char (crops
        # differ by a few px of box jitter); SR text is not asserted
        # because the reference LPSR was trained on real captures and
        # mangles this synthetic font equally at both geometries.
        r_rect = max(results[(736, 1280)][b], key=lambda p: p["score"])
        r_sq = max(results[(1280, 1280)][b], key=lambda p: p["score"])
        assert _lev(r_rect["text"], r_sq["text"]) <= 1, (
            texts[b], r_rect["text"], r_sq["text"])
        assert _lev(r_rect["text"], texts[b]) <= 1, (
            texts[b], r_rect["text"])
        bx, by = np.asarray(r_rect["box"]), np.asarray(r_sq["box"])
        ix = max(0.0, min(bx[2], by[2]) - max(bx[0], by[0]))
        iy = max(0.0, min(bx[3], by[3]) - max(bx[1], by[1]))
        inter = ix * iy
        area = lambda b: (b[2] - b[0]) * (b[3] - b[1])  # noqa: E731
        iou = inter / (area(bx) + area(by) - inter)
        assert iou > 0.8, (iou, bx, by)


@pytest.mark.slow
def test_front_fused_u8_host_packed_matches_reference():
    """uint8 host-packed input path: pack_front_frames_host on raw uint8
    frames + input_scale=1/255 weights must match the XLA reference on
    the normalized frames (the packed-input serving path)."""
    from lpr_tpu.ops import nn as tnn
    from lpr_tpu.ops.pallas.yolo_front import (front_geom,
                                               pack_front_frames_host)

    rng = np.random.RandomState(1)
    p_stem, p_down, p_c3 = _rand_params(rng)
    frames = rng.randint(0, 256, (1, 720, 1280, 3), np.uint8)

    xp = jnp.asarray(pack_front_frames_host(frames, (736, 1280)))
    assert xp.dtype == jnp.uint8
    w = pack_front_weights(p_stem, p_down, p_c3, input_scale=1.0 / 255.0)
    g = front_geom(736, 1280)
    got = np.asarray(front_fused(xp, w, interpret=True, geom=g), np.float32)

    # reference: letterbox (8-row zero pad) -> /255 bf16 -> s2d -> XLA
    lb = np.zeros((1, 736, 1280, 3), np.float32)
    lb[:, 8:728] = frames / 255.0
    x_s2d = tnn.pixel_unshuffle(jnp.asarray(lb, jnp.bfloat16), 2)
    ref = np.asarray(front_reference(x_s2d, p_stem, p_down, p_c3),
                     np.float32)

    assert got.shape == ref.shape == (1, 184, 320, 64)
    err = np.abs(got - ref)
    # extra slack vs the bf16 test: u8*(w/255) vs bf16(u8/255)*w round
    # differently at the input quantization step
    assert err.max() < 0.06, (err.max(), np.argwhere(err > 0.06)[:5])
    assert err[:, 2:-2, 2:-2, :].mean() < 0.006


def test_pack_front_frames_host_matches_device_pack():
    """Numpy host packer == the JAX pack on a pre-letterboxed frame."""
    from lpr_tpu.ops.pallas.yolo_front import (pack_front_frames,
                                               pack_front_frames_host)

    rng = np.random.RandomState(2)
    lb = rng.randint(0, 256, (2, 736, 1280, 3), np.uint8)
    a = pack_front_frames_host(lb, (736, 1280))
    b = np.asarray(pack_front_frames(jnp.asarray(lb)))
    np.testing.assert_array_equal(a, b)
