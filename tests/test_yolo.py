"""YOLO family + NMS parity tests (golden oracle: reference torch model on
weights/char.pt and reference non_max_suppression; see tools/make_golden.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.models.yolo import (
    YoloSpec,
    build_yolo,
    char_ocr_spec,
    load_char_ocr,
    plate_detector,
    yolov5_spec,
)
from lpr_tpu.ops.nms import nms_batched, nms_from_raw, nms_single

from .conftest import REF_CHAR, requires_ref


@pytest.fixture(scope="module")
def char_model():
    return load_char_ocr(REF_CHAR)


@requires_ref
def test_char_ocr_parity(char_yolo_golden, char_model):
    model, params, ck = char_model
    x = jnp.asarray(np.transpose(char_yolo_golden["x"], (0, 2, 3, 1)))
    pred, _ = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    pred = np.asarray(pred)
    ref = char_yolo_golden["pred"]
    assert pred.shape == tuple(ref.shape)
    assert np.abs(pred[..., :4] - ref[..., :4]).max() < 1e-3  # px coords
    assert np.abs(pred[..., 4:] - ref[..., 4:]).max() < 1e-5  # probabilities


@requires_ref
def test_char_ocr_metadata(char_model):
    model, params, ck = char_model
    assert ck.nc == 36
    assert ck.names[:10] == list("0123456789")
    assert model.strides == (8,)
    assert model.anchors.shape == (1, 2, 2)


def test_plate_detector_output_shape():
    """Structural parity with onnx_models/detection/config.pbtxt:
    1280x1280 -> (100800, 16) for nc=11 (weights are a missing blob)."""
    model = plate_detector()
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 1280, 1280, 3))
    pred, raws = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert pred.shape == (1, 100800, 16)
    assert [r.shape for r in raws] == [
        (1, 3, 160, 160, 16),
        (1, 3, 80, 80, 16),
        (1, 3, 40, 40, 16),
    ]


@requires_ref
def test_nms_parity_on_real_preds(char_yolo_golden, char_model):
    """Our padded NMS must select the same detections as the reference
    non_max_suppression on the char model's real outputs."""
    ref_dets = np.load("tests/fixtures/nms_golden.npz")
    pred = jnp.asarray(char_yolo_golden["pred"])
    out = jax.jit(
        lambda p: nms_batched(p, conf_thres=0.25, iou_thres=0.3, max_det=300)
    )(pred)
    for i in range(pred.shape[0]):
        ref = ref_dets[f"det{i}"]
        n = int(out["count"][i])
        assert n == len(ref)
        if n:
            got = np.concatenate(
                [
                    np.asarray(out["boxes"][i][:n]),
                    np.asarray(out["scores"][i][:n, None]),
                    np.asarray(out["classes"][i][:n, None], np.float32),
                ],
                axis=1,
            )
            # order by score desc in both
            ref = ref[np.argsort(-ref[:, 4])]
            np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=1e-2)
            np.testing.assert_allclose(got[:, 4], ref[:, 4], atol=1e-4)
            np.testing.assert_array_equal(got[:, 5], ref[:, 5])


def test_nms_parity_synthetic():
    """Dense clustered synthetic candidates vs the reference algorithm."""
    d = np.load("tests/fixtures/nms_synth_golden.npz")
    raw = jnp.asarray(d["raw"])  # (1, 400, 41)
    ref = d["det"]  # (n, 6)
    out = jax.jit(
        lambda p: nms_batched(p, conf_thres=0.25, iou_thres=0.45, max_det=300)
    )(raw)
    n = int(out["count"][0])
    assert n == len(ref)
    got_scores = np.sort(np.asarray(out["scores"][0][:n]))
    ref_scores = np.sort(ref[:, 4])
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5)
    got_cls = np.sort(np.asarray(out["classes"][0][:n]))
    np.testing.assert_array_equal(got_cls, np.sort(ref[:, 5].astype(np.int32)))


def test_nms_empty():
    pred = jnp.zeros((2, 100, 10))
    out = jax.jit(lambda p: nms_batched(p, max_det=20, pre_topk=64))(pred)
    assert int(out["count"].sum()) == 0
    assert out["boxes"].shape == (2, 20, 4)


def test_nms_class_filter():
    """classes= filter (reference triton_run.py:225-226 plate-class gate)."""
    pred = np.zeros((1, 10, 8), np.float32)  # nc=3
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.1, 0.9, 0.1]  # class 1
    pred[0, 1] = [100, 100, 20, 20, 0.9, 0.9, 0.05, 0.05]  # class 0
    mask = jnp.asarray([False, True, True])
    out = jax.jit(
        lambda p: nms_batched(p, conf_thres=0.25, max_det=10, pre_topk=16,
                              class_mask=mask)
    )(jnp.asarray(pred))
    n = int(out["count"][0])
    assert n == 1
    assert int(out["classes"][0, 0]) == 1


def test_nms_class_ids_matches_mask():
    """Static class-subset candidate selection (class_ids=) is semantically
    identical to the equivalent class_mask — the pipeline's plate stage uses
    the subset form (2 of 11 classes) to shrink the approx_max_k input."""
    rng = np.random.RandomState(3)
    nc = 11
    pred = np.zeros((2, 400, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(40, 600, (2, 400, 2))
    pred[..., 2:4] = rng.uniform(8, 60, (2, 400, 2))
    pred[..., 4] = rng.uniform(0, 1, (2, 400))
    pred[..., 5:] = rng.uniform(0, 1, (2, 400, nc))
    ids = (7, 8)
    mask = np.zeros((nc,), bool)
    mask[list(ids)] = True
    a = jax.jit(lambda p: nms_batched(
        p, conf_thres=0.5, iou_thres=0.3, max_det=16, pre_topk=64,
        class_mask=jnp.asarray(mask)))(jnp.asarray(pred))
    b = jax.jit(lambda p: nms_batched(
        p, conf_thres=0.5, iou_thres=0.3, max_det=16, pre_topk=64,
        class_ids=ids))(jnp.asarray(pred))
    assert int(a["count"].sum()) > 0
    np.testing.assert_array_equal(np.asarray(a["count"]),
                                  np.asarray(b["count"]))
    np.testing.assert_array_equal(np.asarray(a["classes"]),
                                  np.asarray(b["classes"]))
    np.testing.assert_allclose(np.asarray(a["boxes"]),
                               np.asarray(b["boxes"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), atol=1e-6)


@pytest.mark.parametrize("class_ids", [None, (7, 8)])
def test_nms_from_raw_matches_eager_decode(class_ids):
    """Lazy-decode NMS (nms_from_raw on raw Detect logits) == eager
    Detect-decode + nms_batched, on a real built model — the pipeline's
    default path vs the reference-shaped one."""
    model = build_yolo(yolov5_spec(nc=11, depth=0.33, width=0.25),
                       strides=(8, 16, 32))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 96, 128, 3).astype(np.float32))
    kw = dict(conf_thres=0.1, iou_thres=0.45, max_det=32, pre_topk=64,
              multi_label=True, agnostic=True, class_ids=class_ids)

    @jax.jit
    def eager(x):
        pred, _ = model.apply(params, x)
        return nms_batched(pred, **kw)

    @jax.jit
    def lazy(x):
        raws = model.apply(params, x, decode=False)
        return nms_from_raw(raws, model.strides, model.anchors, **kw)

    a, b = eager(x), lazy(x)
    np.testing.assert_array_equal(np.asarray(a["count"]),
                                  np.asarray(b["count"]))
    np.testing.assert_array_equal(np.asarray(a["classes"]),
                                  np.asarray(b["classes"]))
    np.testing.assert_allclose(np.asarray(a["boxes"]),
                               np.asarray(b["boxes"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), atol=1e-6)
    assert int(a["count"].sum()) > 0  # the comparison saw real detections


@requires_ref
def test_detector_wrapper_reads_synthetic_plate():
    """Detector convenience API end-to-end: real char model reads a plate."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.synth_plates import render_plate

    from lpr_tpu.models.detector import load_char_detector
    from lpr_tpu.pipeline.chars import reading_order

    det = load_char_detector(REF_CHAR, conf_thres=0.5,
                             dtype=jnp.float32)
    frame = render_plate("29A1234", size=(200, 64))
    res = det.detect(frame)
    assert len(res) >= 5
    order = reading_order(res.boxes)
    text = "".join(res.names[int(res.classes[i])].upper() for i in order)
    assert text == "29A1234"
    rows = res.pandas()
    assert {"xmin", "confidence", "name"} <= set(rows[0])
    lst = res.tolist()
    assert len(lst[0]) == 3


def test_classify_head():
    from lpr_tpu.models.yolo import Classify

    c = Classify(16, 5)
    c.i, c.f = 0, -1
    p = c.init(jax.random.PRNGKey(0))
    y = c(p, jnp.zeros((2, 8, 8, 16)))
    assert y.shape == (2, 5)


def test_s2d_downsampler_equivalence():
    """Conv(3, s=2) == S2D + Conv(2, pad (1,0)) with mapped weights."""
    import lpr_tpu.models.yolo as Y
    from lpr_tpu.models.yolo import Conv, _conv
    from lpr_tpu.ops import nn as tnn

    tnn.set_default_precision("highest")
    c = Conv(32, 64, 3, 2)
    c.i, c.f = 0, -1
    p = c.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 32))
    Y.S2D_DOWNSAMPLERS = True
    try:
        assert c._is_s2d_down()
        y_fast = c(p, x)
        y_ref = _conv(p, x, k=3, stride=2, pad=1)
        assert y_fast.shape == y_ref.shape == (2, 16, 24, 64)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   atol=2e-5)
    finally:
        Y.S2D_DOWNSAMPLERS = False


def test_parallel_nms_matches_sequential():
    """The fixpoint greedy NMS must equal the textbook sequential greedy
    on adversarial chained-overlap layouts."""
    from lpr_tpu.ops.nms import _greedy_suppress
    from lpr_tpu.ops.boxes import box_iou

    rng = np.random.RandomState(0)
    for trial in range(8):
        k = 64
        # chains: boxes sliding in small increments overlap their neighbors
        base = rng.rand(k, 2) * 60
        off = np.cumsum(rng.rand(k, 2) * 6, 0) % 80
        boxes = np.concatenate([off, off + 20 + rng.rand(k, 2) * 5], 1)
        boxes = jnp.asarray(boxes.astype(np.float32))
        valid = jnp.asarray(rng.rand(k) > 0.1)
        iou = box_iou(boxes, boxes)
        got = np.asarray(_greedy_suppress(iou, valid, 0.3))
        # sequential reference
        ioun = np.asarray(iou)
        validn = np.asarray(valid)
        suppressed = np.zeros(k, bool)
        for i in range(k):
            if validn[i] and not suppressed[i]:
                suppressed |= (ioun[i] > 0.3) & (np.arange(k) > i)
        want = validn & ~suppressed
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_ghost_modules_match_torch_reference():
    """Import-parity for GhostConv/GhostBottleneck against the reference
    torch modules (common.py:211-236).  Round-1 bug: SiLU was applied in the
    pw-linear second GhostConv of GhostBottleneck (reference uses act=False
    there); the golden stack covers both s=1 and s=2 bottlenecks."""
    import os

    from lpr_tpu.models.yolo import GhostBottleneck, GhostConv

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "ghost_golden.npz")
    z = np.load(path)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    layers = [GhostConv(8, 16, 3, 1),
              GhostBottleneck(16, 16, 3, 1),
              GhostBottleneck(16, 24, 5, 2)]
    params = [l.import_torch(sd, str(i)) for i, l in enumerate(layers)]

    def fwd(params, x):
        for l, p in zip(layers, params):
            x = l(p, x)
        return x

    x = jnp.asarray(np.transpose(z["x"], (0, 2, 3, 1)))  # NCHW -> NHWC
    y = jax.jit(fwd)(params, x)
    y_ref = np.transpose(z["y"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)


def test_builder_ghost_bottleneck_args():
    """The yaml grammar must forward k/s to GhostBottleneck like the
    reference parse_model (round-1: they were dropped, so stride-2 ghost
    blocks built as s=1 and failed on the residual add)."""
    spec = YoloSpec(
        nc=2, depth_multiple=1.0, width_multiple=1.0,
        anchors=[[10, 10, 30, 30]],
        backbone=((-1, 1, "Conv", [16, 3, 2]),
                  (-1, 1, "GhostConv", [32, 3, 2]),
                  (-1, 1, "GhostBottleneck", [32, 3, 1]),
                  (-1, 1, "GhostBottleneck", [64, 3, 2])),
        head=(([3], 1, "Detect", ["nc", "anchors"]),),
    )
    m = build_yolo(spec, strides=(8,))
    p = m.init(jax.random.PRNGKey(0))
    pred, _ = jax.jit(lambda p, x: m.apply(p, x))(p, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 128, 7)  # 8x8 cells x 2 anchors, nc=2+5
    assert np.isfinite(np.asarray(pred)).all()


def test_merge_nms_weighted_boxes():
    """Merge-NMS (general.py:755-763): kept box = score-weighted mean of all
    overlapping candidates; redundant drops unsupported singletons."""
    # cluster A: two overlapping boxes; cluster B: one isolated box
    preds = np.zeros((3, 6), np.float32)  # xywh, obj, 1 class
    preds[0] = [50, 50, 20, 20, 0.9, 1.0]
    preds[1] = [52, 52, 20, 20, 0.6, 1.0]
    preds[2] = [150, 150, 20, 20, 0.8, 1.0]
    out = jax.jit(lambda p: nms_single(
        p, conf_thres=0.1, iou_thres=0.45, max_det=4, pre_topk=3,
        multi_label=False, agnostic=True, merge=True, redundant=False,
    ))(jnp.asarray(preds))
    n = int(out["count"])
    boxes = np.asarray(out["boxes"])[:n]
    scores = np.asarray(out["scores"])[:n]
    # cluster A keeps one box: weighted mean of boxes 0 and 1
    b0 = np.array([40, 40, 60, 60], np.float32)
    b1 = np.array([42, 42, 62, 62], np.float32)
    want = (0.9 * b0 + 0.6 * b1) / 1.5
    got_a = boxes[np.argmax(scores)]
    np.testing.assert_allclose(got_a, want, atol=1e-3)
    # isolated cluster B survives without redundancy...
    assert n == 2
    # ...but is dropped when redundant=True (reference default)
    out_r = jax.jit(lambda p: nms_single(
        p, conf_thres=0.1, iou_thres=0.45, max_det=4, pre_topk=3,
        multi_label=False, agnostic=True, merge=True, redundant=True,
    ))(jnp.asarray(preds))
    assert int(out_r["count"]) == 1


@requires_ref
def test_ensemble_load_and_nms_concat():
    """attempt_load([a, b]) equivalent: detections concatenated along the
    box dim (experimental.py:89-99); a duplicate-model ensemble must NMS to
    the single-model detections."""
    from lpr_tpu.models.yolo import YoloEnsemble, load_yolo_torch

    single, sp, ck1 = load_yolo_torch(REF_CHAR)
    ens, eps, ck2 = load_yolo_torch([REF_CHAR, REF_CHAR])
    assert isinstance(ens, YoloEnsemble)
    assert ck2.names == ck1.names
    assert ens.stride == max(single.strides)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    p1, _ = jax.jit(lambda p, v: single.apply(p, v))(sp, x)
    pe, _ = jax.jit(lambda p, v: ens.apply(p, v))(eps, x)
    assert pe.shape[1] == 2 * p1.shape[1]
    d1 = jax.jit(lambda p: nms_batched(p, 0.1, 0.45, max_det=8,
                                       pre_topk=64))(p1)
    de = jax.jit(lambda p: nms_batched(p, 0.1, 0.45, max_det=8,
                                       pre_topk=64))(pe)
    assert int(d1["count"][0]) == int(de["count"][0])
    n = int(d1["count"][0])
    np.testing.assert_allclose(np.asarray(d1["boxes"][0][:n]),
                               np.asarray(de["boxes"][0][:n]), atol=1e-3)


def test_conv2d_int8_close_to_f32():
    """Dynamic int8 conv matches the f32 conv within 8-bit quant error."""
    import lpr_tpu.ops.nn as tnn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 32, 48) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(48).astype(np.float32) * 0.1)
    ref = tnn.conv2d(x, w, b, stride=1, padding="same")
    wq, ws = tnn.quantize_conv_weight(w)
    out = tnn.conv2d_int8(x, wq, ws, b, stride=1, padding="same")
    err = float(jnp.max(jnp.abs(out - ref)))
    scale_mag = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale_mag < 0.02, (err, scale_mag)


def test_quantize_yolo_preds_close_and_structure():
    """quantize_yolo swaps eligible convs to int8 (BN folded), keeps the
    Detect head float, and preserves detection outputs within quant error."""
    from lpr_tpu.models.yolo import Detect, build_yolo, quantize_yolo, yolov5_spec

    model = build_yolo(yolov5_spec(nc=4, depth=0.33, width=0.25),
                       strides=(8, 16, 32))
    key = jax.random.PRNGKey(0)
    params = model.init(key)
    qparams = quantize_yolo(model, params)

    # structure: detect head untouched; some convs quantized
    assert "w" in qparams[-1]["m"][0] and "w_q" not in str(type(qparams[-1]))
    flat = jax.tree.leaves(jax.tree.map(lambda a: a.dtype == jnp.int8, qparams))
    assert any(bool(f) for f in flat), "no conv was quantized"

    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3)
                    .astype(np.float32))
    pred_f, _ = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    pred_q, _ = jax.jit(lambda p, x: model.apply(p, x))(qparams, x)
    assert pred_q.shape == pred_f.shape
    # boxes (px units) close; scores (sigmoid) close
    box_err = float(jnp.max(jnp.abs(pred_q[..., :4] - pred_f[..., :4])))
    score_err = float(jnp.max(jnp.abs(pred_q[..., 4:] - pred_f[..., 4:])))
    assert box_err < 2.0, box_err          # < 2 px drift on a 64px image
    assert score_err < 0.05, score_err     # random-weight scores ~0.5


def test_blocked_nms_nondivisible_k():
    """Blocked greedy suppression pads K not divisible by the block size and
    still matches sequential greedy."""
    from lpr_tpu.ops.boxes import box_iou
    from lpr_tpu.ops.nms import _greedy_suppress

    rng = np.random.RandomState(7)
    k = 50  # not a multiple of 16
    off = np.cumsum(rng.rand(k, 2) * 5, 0) % 70
    boxes = jnp.asarray(np.concatenate([off, off + 18], 1).astype(np.float32))
    valid = jnp.asarray(rng.rand(k) > 0.2)
    iou = box_iou(boxes, boxes)
    got = np.asarray(jax.jit(lambda i, v: _greedy_suppress(i, v, 0.3))(iou, valid))
    ioun, validn = np.asarray(iou), np.asarray(valid)
    suppressed = np.zeros(k, bool)
    for i in range(k):
        if validn[i] and not suppressed[i]:
            suppressed |= (ioun[i] > 0.3) & (np.arange(k) > i)
    np.testing.assert_array_equal(got, validn & ~suppressed)


def test_yolov5_p6_hub_variant():
    """4-scale P6 hub preset (reference models/hub/yolov5s6.yaml): strides
    8/16/32/64, 3 anchors/scale, decoded count = 3*(16^2+8^2+4^2+2^2) at
    128^2, per-scale raw grids correct, decode finite."""
    from lpr_tpu.models.yolo import yolov5

    m = yolov5("n6", nc=4)
    assert m.strides == (8, 16, 32, 64)
    p = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    pred, raws = jax.jit(lambda p, x: m.apply(p, x))(p, x)
    assert pred.shape == (1, 3 * (16**2 + 8**2 + 4**2 + 2**2), 9)
    assert [r.shape[2] for r in raws] == [16, 8, 4, 2]
    assert np.isfinite(np.asarray(pred)).all()
