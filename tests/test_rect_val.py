"""Rect (aspect-bucketed) validation batching + label cache.

Reference semantics: LoadImagesAndLabels rect mode letterboxes each batch to
a stride-aligned minimal rectangle (datasets.py:466-483) and caches parsed
labels + shapes (:418-424, 484-507).  TPU twist under test: a <=3-shape
palette so the whole folder compiles at most 3 XLA programs.
"""

import os
import random
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpr_tpu.data.yolo_data import YoloValDataset, scan_labels_cached


def _make_dataset(root, n=10, seed=0):
    rng = random.Random(seed)
    img_dir = os.path.join(root, "images")
    lab_dir = os.path.join(root, "labels")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    sizes = [(480, 640), (360, 640), (320, 320), (640, 360)]
    for i in range(n):
        h, w = sizes[i % len(sizes)]
        img = np.full((h, w, 3), 60, np.uint8)
        bw, bh = rng.randint(60, 120), rng.randint(40, 80)
        x1 = rng.randint(0, w - bw - 1)
        y1 = rng.randint(0, h - bh - 1)
        img[y1:y1 + bh, x1:x1 + bw] = 220
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:03d}.jpg"))
        with open(os.path.join(lab_dir, f"{i:03d}.txt"), "w") as f:
            f.write(f"1 {(x1 + bw / 2) / w:.6f} {(y1 + bh / 2) / h:.6f} "
                    f"{bw / w:.6f} {bh / h:.6f}\n")
    return img_dir, lab_dir


def test_label_cache_roundtrip_and_invalidation(tmp_path):
    img_dir, lab_dir = _make_dataset(str(tmp_path), n=6)
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir))
    labels1, shapes1 = scan_labels_cached(paths, lab_dir)
    cache = os.path.join(lab_dir, ".lpr_labels.cache.npz")
    assert os.path.exists(cache)
    # second scan: served from cache, identical content
    labels2, shapes2 = scan_labels_cached(paths, lab_dir)
    np.testing.assert_array_equal(shapes1, shapes2)
    for a, b in zip(labels1, labels2):
        np.testing.assert_array_equal(a, b)
    # editing a label file invalidates the cache
    p0 = os.path.join(lab_dir, "000.txt")
    with open(p0, "w") as f:
        f.write("2 0.5 0.5 0.2 0.2\n")
    os.utime(p0, (os.path.getmtime(p0) + 10,) * 2)
    labels3, _ = scan_labels_cached(paths, lab_dir)
    assert labels3[0][0, 0] == 2.0


def test_rect_batches_shapes_and_label_geometry(tmp_path):
    img_dir, lab_dir = _make_dataset(str(tmp_path), n=12)
    ds = YoloValDataset(img_dir, lab_dir, imgsz=640, stride=32, max_labels=8)
    seen_shapes = set()
    total_real = 0
    for imgs, labels, real in ds.batches(4, rect=True):
        seen_shapes.add(imgs.shape[1:3])
        total_real += real
        h, w = imgs.shape[1:3]
        assert h % 32 == 0 and w % 32 == 0
        for i in range(real):
            lab = labels[i]
            lab = lab[lab[:, 3] > 0]
            assert len(lab) >= 1
            # the white box must actually be at the label's position
            cx, cy = lab[0, 1] * w, lab[0, 2] * h
            assert imgs[i, int(cy), int(cx)].mean() > 0.8  # 220/255 white
    assert total_real == 12
    assert len(seen_shapes) <= 3  # the palette bound
    # landscape images (the majority) got a shorter-than-square batch shape
    assert any(h < w for h, w in seen_shapes)


@pytest.mark.slow
def test_rect_map_matches_square_map(tmp_path):
    """Rect val must reproduce square-pad mAP within tolerance on the demo
    detector (the padded FLOPs are the only difference)."""
    import jax

    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.train.yolo import validate_map
    from lpr_tpu.weights.checkpoint import load_params

    ckpt = os.path.join(os.path.dirname(__file__), "..",
                        "checkpoints", "demo_plate.npz")
    if not os.path.exists(ckpt):
        pytest.skip("demo detector checkpoint missing")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from synth_plates import random_plate_text, render_frame_with_plates

    rng = random.Random(4)
    img_dir = os.path.join(str(tmp_path), "images")
    lab_dir = os.path.join(str(tmp_path), "labels")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    for i in range(8):
        h, w = (320, 448) if i % 2 == 0 else (320, 320)
        pw = rng.randint(90, 150)
        ph = int(pw * 0.3)
        x1 = rng.randint(0, w - pw - 1)
        y1 = rng.randint(0, h - ph - 1)
        t = random_plate_text(rng, False)
        frame = render_frame_with_plates(
            (h, w), [(t, False, (x1, y1, x1 + pw, y1 + ph))], rng)
        Image.fromarray(frame).save(os.path.join(img_dir, f"{i:03d}.png"))
        with open(os.path.join(lab_dir, f"{i:03d}.txt"), "w") as f:
            f.write(f"8 {(x1 + pw / 2) / w:.6f} {(y1 + ph / 2) / h:.6f} "
                    f"{pw / w:.6f} {ph / h:.6f}\n")

    model = build_yolo(yolov5_spec(nc=11, depth=0.33, width=0.25),
                       strides=(8, 16, 32))
    params = load_params(ckpt, model.init(jax.random.PRNGKey(0)))
    ds = YoloValDataset(img_dir, lab_dir, imgsz=320, stride=32, max_labels=8)
    m_sq = validate_map(model, params, ds.batches(4, rect=False),
                        conf_thres=0.01)
    m_rect = validate_map(model, params, ds.batches(4, rect=True),
                          conf_thres=0.01)
    assert m_sq["map50"] > 0.5  # the detector actually detects
    assert abs(m_rect["map50"] - m_sq["map50"]) < 0.1
