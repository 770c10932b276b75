"""AutoAnchor / callbacks / loggers / observability tests."""

import os

import numpy as np
import pytest

from lpr_tpu.utils.autoanchor import anchor_metric, check_anchors, kmeans_anchors
from lpr_tpu.utils.callbacks import Callbacks
from lpr_tpu.utils.loggers import CsvLogger, Loggers
from lpr_tpu.utils.observability import FpsMeter, StageTimer


def test_kmeans_anchors_recovers_clusters():
    rng = np.random.RandomState(0)
    true = np.asarray([[10, 12], [40, 20], [90, 95]])
    wh = np.concatenate([
        t + rng.randn(200, 2) * 2 for t in true
    ]).clip(2, None)
    anchors = kmeans_anchors(wh, n=3, gen=200, seed=0)
    assert anchors.shape == (3, 2)
    bpr, _ = anchor_metric(wh, anchors)
    assert bpr > 0.99


def test_check_anchors_keeps_good():
    wh = np.asarray([[10.0, 10.0]] * 50)
    anchors = np.asarray([[[10.0, 10.0], [12.0, 12.0]]])
    out, evolved = check_anchors(wh, anchors)
    assert not evolved
    np.testing.assert_array_equal(out, anchors)


def test_check_anchors_evolves_bad():
    rng = np.random.RandomState(1)
    wh = (rng.rand(300, 2) * 50 + 10).astype(np.float32)
    anchors = np.asarray([[[1.0, 1.0], [1.5, 1.5]]])  # terrible
    out, evolved = check_anchors(wh, anchors)
    assert evolved
    bpr, _ = anchor_metric(wh, out.reshape(-1, 2))
    assert bpr > 0.9


def test_callbacks():
    cb = Callbacks()
    hits = []
    cb.register_action("on_train_start", "t", lambda x: hits.append(x))
    cb.run("on_train_start", 42)
    assert hits == [42]
    with pytest.raises(ValueError):
        cb.run("nope")
    with pytest.raises(ValueError):
        cb.register_action("on_train_start", "bad", None)


def test_csv_logger(tmp_path):
    p = str(tmp_path / "runs" / "results.csv")
    log = CsvLogger(p)
    log.log({"loss": 1.0, "acc": 0.5}, step=0)
    log.log({"loss": 0.5, "acc": 0.7}, step=1)
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "step,loss,acc"
    assert len(lines) == 3


def test_loggers_facade(tmp_path):
    lg = Loggers(str(tmp_path / "run"))
    lg.log({"x": 1.0}, 0)
    assert os.path.exists(tmp_path / "run" / "results.csv")


def test_fps_meter_and_stage_timer():
    m = FpsMeter()
    assert m.tick() == 0.0
    assert m.tick() > 0.0
    t = StageTimer()
    with t.time("stage_a"):
        pass
    assert "stage_a" in t.report()


def test_model_summary():
    from lpr_tpu.models.yolo import build_yolo, char_ocr_spec
    from lpr_tpu.utils.observability import model_summary

    m = build_yolo(char_ocr_spec(), ckpt_anchors=np.ones((1, 2, 2)),
                   strides=(8,))
    s = model_summary(m)
    assert "total params:" in s
    assert "Detect" in s
