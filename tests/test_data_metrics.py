"""Dataset + detection-metric tests."""

import os

import numpy as np
import pytest
from PIL import Image

from lpr_tpu.data.datasets import PairedImageDataset, UnpairedImageDataset
from lpr_tpu.data.yolo_data import (
    YoloAugConfig,
    YoloDataset,
    letterbox_np,
    load_yolo_labels,
)
from lpr_tpu.eval.metrics import (
    ConfusionMatrix,
    DetectionEvaluator,
    ap_per_class,
    box_iou_np,
    compute_ap,
    match_predictions,
)


@pytest.fixture()
def img_tree(tmp_path):
    rng = np.random.RandomState(0)
    for sub in ("hr", "lr", "trainA", "trainB", "images", "labels"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(4):
        arr = (rng.rand(40, 120, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "hr" / f"p{i}.png")
        Image.fromarray(arr // 2).save(tmp_path / "lr" / f"p{i}.png")
        Image.fromarray(arr).save(tmp_path / "trainA" / f"a{i}.png")
        Image.fromarray(arr).save(tmp_path / "trainB" / f"b{i}.png")
        Image.fromarray(arr).save(tmp_path / "images" / f"im{i}.png")
        with open(tmp_path / "labels" / f"im{i}.txt", "w") as f:
            f.write("0 0.5 0.5 0.4 0.6\n1 0.25 0.25 0.1 0.2\n")
    return tmp_path


def test_paired_dataset(img_tree):
    ds = PairedImageDataset(str(img_tree / "hr"), str(img_tree / "lr"))
    assert len(ds) == 4
    lr, hr = ds[0]
    assert lr.shape == (32, 192, 3)
    assert hr.shape == (32, 192, 1)  # HR grayscale, reference lpsr_dataset.py:26
    batches = list(ds.batches(2, seed=1))
    assert batches[0][0].shape == (2, 32, 192, 3)


def test_unpaired_dataset(img_tree):
    ds = UnpairedImageDataset(str(img_tree), hw=(32, 64))
    a, b = ds[0]
    assert a.shape == (32, 64, 3) and b.shape == (32, 64, 3)
    assert a.min() >= -1 and a.max() <= 1


def test_yolo_dataset_plain(img_tree):
    ds = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"),
                     img_hw=(128, 128), max_labels=8, augment=False)
    img, labels = ds.get(0)
    assert img.shape == (128, 128, 3)
    assert labels.shape == (8, 5)
    assert (labels[:, 3] > 0).sum() == 2  # two real labels
    # cx of first label stays at 0.5 after symmetric letterbox
    assert abs(labels[0, 1] - 0.5) < 0.02


def test_yolo_dataset_image_cache(img_tree):
    """RAM image cache (reference datasets.py:484-507): same samples as the
    uncached loader, populated after first touch, budget cap respected."""
    kw = dict(img_hw=(128, 128), max_labels=8, augment=False)
    cold = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"), **kw)
    hot = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"),
                      cache_images=True, **kw)
    gb = hot.cache_all(workers=2)
    assert len(hot._cache) == 4 and gb > 0
    for i in range(4):
        ic, lc = cold.get(i)
        ih, lh = hot.get(i)
        np.testing.assert_array_equal(ic, ih)
        np.testing.assert_array_equal(lc, lh)
    capped = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"),
                         cache_images=True, cache_budget_bytes=1, **kw)
    capped.get(0)
    assert len(capped._cache) == 0  # over budget: nothing cached
    img, labels = capped.get(0)    # still correct uncached
    np.testing.assert_array_equal(img, cold.get(0)[0])


def test_yolo_dataset_augmented(img_tree):
    ds = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"),
                     img_hw=(128, 128), max_labels=16, augment=True, seed=3)
    for i in range(4):
        img, labels = ds.get(i)
        assert img.shape == (128, 128, 3)
        v = labels[labels[:, 3] > 0]
        if len(v):
            assert (v[:, 1:] >= 0).all() and (v[:, 1:] <= 1).all()
    b = next(ds.batches(2))
    assert b[0].shape == (2, 128, 128, 3) and b[1].shape == (2, 16, 5)


def test_compute_ap_perfect():
    r = np.asarray([0.5, 1.0])
    p = np.asarray([1.0, 1.0])
    assert compute_ap(r, p) > 0.99


def test_match_predictions():
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    pred = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    tp = match_predictions(pred, np.asarray([0, 0]), gt, np.asarray([0]),
                           np.asarray([0.5]))
    assert tp[0, 0] and not tp[1, 0]
    # class mismatch -> no match
    tp2 = match_predictions(pred, np.asarray([1, 1]), gt, np.asarray([0]),
                            np.asarray([0.5]))
    assert not tp2.any()


def test_detection_evaluator_perfect_map():
    ev = DetectionEvaluator()
    gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    ev.add(gt, np.asarray([0.9, 0.8]), np.asarray([0, 1]), gt,
           np.asarray([0, 1]))
    m = ev.compute()
    assert m["map50"] > 0.99
    assert m["map"] > 0.99


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=2)
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    cm.process_batch(gt, np.asarray([0.9]), np.asarray([0]), gt, np.asarray([0]))
    assert cm.matrix[0, 0] == 1
    cm.process_batch(np.zeros((0, 4)), np.zeros(0), np.zeros(0), gt,
                     np.asarray([1]))
    assert cm.matrix[2, 1] == 1  # missed gt -> background row


def test_mosaic9_and_visualize(img_tree, tmp_path):
    from lpr_tpu.data.yolo_data import YoloAugConfig, YoloDataset

    ds = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"),
                     img_hw=(96, 96), max_labels=32, augment=True,
                     aug=YoloAugConfig(use_mosaic9=True), seed=1)
    img, labels = ds.get(0)
    assert img.shape == (96, 96, 3)
    v = labels[labels[:, 3] > 0]
    if len(v):
        assert (v[:, 1:] >= 0).all() and (v[:, 1:] <= 1).all()

    from lpr_tpu.train.visualize import (
        save_cyclegan_epoch_grid,
        save_lpsr_epoch_grid,
    )

    lr = [np.random.rand(32, 192, 3)] * 2
    sr = [np.random.rand(32, 192, 1)] * 2
    save_lpsr_epoch_grid(str(tmp_path / "g.png"), lr, sr, sr)
    assert (tmp_path / "g.png").exists()
    a = np.random.rand(1, 32, 32, 3) * 2 - 1
    save_cyclegan_epoch_grid(str(tmp_path / "cg.png"), a, a, a, a, a, a)
    assert (tmp_path / "cg.png").exists()


def test_yolo_dataset_transform_hook(img_tree):
    from lpr_tpu.data.yolo_data import YoloDataset

    calls = []

    def hook(img, labels, rng):
        calls.append(img.shape)
        return img, labels

    ds = YoloDataset(str(img_tree / "images"), str(img_tree / "labels"),
                     img_hw=(64, 64), augment=True, transform=hook)
    ds.get(0)
    assert calls


def test_copy_paste_mirrors_instances():
    """copy_paste pastes the horizontal mirror of an instance and appends
    the mirrored label when IoA vs existing labels < 0.30
    (reference augmentations.py:224-241)."""
    import random

    from lpr_tpu.data.yolo_data import bbox_ioa, copy_paste

    img = np.zeros((40, 100, 3), np.uint8)
    img[10:20, 5:25] = 200  # bright instance on the left
    labels = np.array([[2, 5, 10, 25, 20]], np.float32)
    out, new_labels = copy_paste(img, labels, random.Random(0), p=1.0)
    assert len(new_labels) == 2
    # mirrored box: (100-25, 10, 100-5, 20)
    np.testing.assert_allclose(new_labels[1], [2, 75, 10, 95, 20])
    # mirrored pixels pasted; originals untouched
    assert (out[10:20, 75:95] == 200).all()
    assert (out[10:20, 5:25] == 200).all()
    # ioa blocks pasting when the mirror overlaps an existing instance
    mid = np.array([[0, 40, 10, 60, 20]], np.float32)
    out2, l2 = copy_paste(img, mid, random.Random(0), p=1.0)
    assert len(l2) == 1 and (out2 == img).all()
    # bbox_ioa basics
    ioa = bbox_ioa(np.array([0, 0, 10, 10], np.float32),
                   np.array([[5, 5, 15, 15]], np.float32))
    np.testing.assert_allclose(ioa, [0.25])


def test_copy_paste_with_segments():
    """Polygon segments restrict the pasted mask to the instance shape."""
    import random

    from lpr_tpu.data.yolo_data import copy_paste

    img = np.zeros((40, 100, 3), np.uint8)
    img[10:31, 10:31] = 200  # bright square instance
    labels = np.array([[1, 10, 10, 30, 30]], np.float32)
    tri = np.array([[10, 10], [30, 10], [10, 30]], np.float32)
    out, new_labels = copy_paste(img, labels, random.Random(0), p=1.0,
                                 segments=[tri])
    assert len(new_labels) == 2
    # inside the mirrored triangle: instance pixels pasted
    assert (out[12, 100 - 12 - 1] == 200).all()
    # inside the mirrored box but outside the triangle: background stays
    assert (out[28, 100 - 28 - 1] == 0).all()
