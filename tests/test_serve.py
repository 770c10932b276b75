"""Serving layer tests: dynamic batching dispatch + HTTP front-end."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from lpr_tpu.serve.server import InferenceServer, ServeConfig


class FakeRecognizer:
    """Stands in for PlateRecognizer: records batch sizes, returns one fake
    plate per frame."""

    def __init__(self, delay=0.01):
        self.batches = []
        self.delay = delay

    def recognize(self, frames):
        self.batches.append(frames.shape[0])
        time.sleep(self.delay)
        return [
            [{"box": [0, 0, 1, 1], "score": 0.9, "text": f"T{i}",
              "text_sr": f"S{i}", "sr": None}]
            for i in range(frames.shape[0])
        ]


def test_server_batches_requests():
    rec = FakeRecognizer()
    cfg = ServeConfig(max_batch=4, max_delay_ms=50.0)
    with InferenceServer(rec, cfg) as srv:
        frames = [np.full((8, 8, 3), i, np.uint8) for i in range(8)]
        futs = [srv.submit(f) for f in frames]
        results = [f.result(timeout=10) for f in futs]
    assert all(len(r) == 1 for r in results)
    # dynamic batching actually batched (all compiled batches are max_batch)
    assert set(rec.batches) == {4}
    assert srv.stats.requests == 8
    assert srv.stats.mean_batch > 1.0


def test_server_single_request_latency_window():
    rec = FakeRecognizer()
    with InferenceServer(rec, ServeConfig(max_batch=8, max_delay_ms=1.0)) as srv:
        out = srv.infer(np.zeros((4, 4, 3), np.uint8))
    assert out[0]["text"] == "T0"
    assert srv.stats.frames_padded == 7  # padded to compiled batch


def test_server_propagates_errors():
    class Boom(FakeRecognizer):
        def recognize(self, frames):
            raise RuntimeError("boom")

    with InferenceServer(Boom(), ServeConfig(max_batch=2, max_delay_ms=1.0)) as srv:
        fut = srv.submit(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(RuntimeError):
            fut.result(timeout=10)


def test_server_rejects_mismatched_shapes_at_submit():
    """Frames of different resolutions cannot share one compiled batch; the
    second shape must be rejected in submit() (not die in the collector and
    hang every future — round-1 advisor finding)."""
    rec = FakeRecognizer()
    with InferenceServer(rec, ServeConfig(max_batch=4, max_delay_ms=5.0)) as srv:
        ok = srv.submit(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(ValueError):
            srv.submit(np.zeros((16, 16, 3), np.uint8))
        with pytest.raises(ValueError):
            srv.submit(np.zeros((8, 8, 3), np.float32))  # wrong dtype
        with pytest.raises(ValueError):
            srv.submit(np.zeros((8, 8), np.uint8))  # wrong rank
        assert len(ok.result(timeout=10)) == 1
        # the loop survived: a follow-up same-shape request still works
        assert srv.infer(np.zeros((8, 8, 3), np.uint8))[0]["text"] == "T0"


def test_server_frame_hw_lock_up_front():
    rec = FakeRecognizer()
    cfg = ServeConfig(max_batch=2, max_delay_ms=1.0, frame_hw=(8, 8))
    with InferenceServer(rec, cfg) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((4, 4, 3), np.uint8))
        assert srv.infer(np.zeros((8, 8, 3), np.uint8))[0]["text"] == "T0"


def test_server_file_ingestion(tmp_path):
    """submit_path/submit_paths/submit_bytes: native host decode + letterbox
    feed the dynamic-batching queue (the Triton-client letterbox moved
    server-side, triton_run.py:120)."""
    from PIL import Image

    rec = FakeRecognizer()
    paths = []
    for i in range(6):
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(
            np.full((30, 60, 3), 40 * i, np.uint8)).save(p, quality=90)
        paths.append(str(p))

    cfg = ServeConfig(max_batch=4, max_delay_ms=20.0, frame_hw=(16, 32),
                      decode_workers=2)
    with InferenceServer(rec, cfg) as srv:
        one = srv.submit_path(paths[0]).result(timeout=10)
        assert one[0]["text"] == "T0"
        futs = srv.submit_paths(paths)
        outs = [f.result(timeout=10) for f in futs]
        assert all(len(o) == 1 for o in outs)
        data = open(paths[0], "rb").read()
        assert srv.submit_bytes(data).result(timeout=10)[0]["text"].startswith("T")
        # undecodable bytes reject the future, not the server
        bad = srv.submit_bytes(b"not an image")
        with pytest.raises(Exception):
            bad.result(timeout=10)
        assert srv.infer(np.zeros((16, 32, 3), np.uint8))[0]["text"] == "T0"
    assert srv.stats.requests == 9


def test_server_file_ingestion_requires_shape():
    rec = FakeRecognizer()
    with InferenceServer(rec, ServeConfig(max_batch=2)) as srv:
        with pytest.raises(ValueError):
            srv.submit_path("/nonexistent.jpg")


def test_http_frontend():
    from lpr_tpu.serve.http import HttpFrontend

    rec = FakeRecognizer()
    with InferenceServer(rec, ServeConfig(max_batch=2, max_delay_ms=1.0)) as srv:
        fe = HttpFrontend(srv, port=0).start()
        try:
            url = f"http://127.0.0.1:{fe.port}"
            with urllib.request.urlopen(url + "/v2/health/ready") as r:
                assert r.status == 200
            buf = io.BytesIO()
            np.save(buf, np.zeros((8, 8, 3), np.uint8))
            req = urllib.request.Request(
                url + "/v2/models/pipeline/infer", data=buf.getvalue()
            )
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
            assert out[0]["text"] == "T0"
            assert "sr" not in out[0]
        finally:
            fe.stop()


def test_server_batched_submit_and_stats_percentiles():
    rec = FakeRecognizer()
    with InferenceServer(rec, ServeConfig(max_batch=4, max_delay_ms=20.0)) as srv:
        frames = np.zeros((8, 8, 8, 3), np.uint8)
        results = srv.infer_many(frames)
    assert len(results) == 8 and all(len(r) == 1 for r in results)
    s = srv.stats.summary()
    assert s["requests"] == 8
    assert s["latency_ms_p50"] > 0
    assert s["latency_ms_p99"] >= s["latency_ms_p50"]
    assert s["throughput_fps"] > 0


def test_http_infer_batch_and_stats_routes():
    from lpr_tpu.serve.http import HttpFrontend

    rec = FakeRecognizer()
    with InferenceServer(rec, ServeConfig(max_batch=4, max_delay_ms=5.0)) as srv:
        fe = HttpFrontend(srv, port=0).start()
        try:
            url = f"http://127.0.0.1:{fe.port}"
            buf = io.BytesIO()
            np.save(buf, np.zeros((3, 8, 8, 3), np.uint8))
            req = urllib.request.Request(
                url + "/v2/models/pipeline/infer_batch", data=buf.getvalue())
            with urllib.request.urlopen(req) as r:
                out = json.loads(r.read())
            assert len(out) == 3 and out[0][0]["text"] == "T0"
            with urllib.request.urlopen(url + "/v2/stats") as r:
                stats = json.loads(r.read())
            assert stats["requests"] == 3
            assert "latency_ms_p99" in stats
            # wrong rank must 400, not kill the server
            buf2 = io.BytesIO()
            np.save(buf2, np.zeros((8, 8, 3), np.uint8))
            req2 = urllib.request.Request(
                url + "/v2/models/pipeline/infer_batch", data=buf2.getvalue())
            try:
                urllib.request.urlopen(req2)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            fe.stop()


class FakeFrozenRecognizer:
    """FakeRecognizer variant exposing the frozen-step dispatch API that the
    device-pool (engine-rate) serving mode requires: _step_frozen consumes
    the device-gathered batch, assemble() post-processes the fetched tree."""

    def __init__(self):
        class Cfg:
            packed_input = False
            freeze_params = True

        self.cfg = Cfg()
        self.batches = []

    def _step_frozen(self, fr):
        self.batches.append(int(fr.shape[0]))
        # per-frame fingerprint so the test can verify index routing; the
        # "sr" leaf stands in for the heavy SR crop images
        return {"mean": fr.astype("float32").mean(axis=(1, 2, 3)),
                "sr": fr.astype("float32")}

    def step_raw(self, batch, packed=None):
        import jax.numpy as jnp

        return self._step_frozen(jnp.asarray(batch))

    def assemble(self, out):
        self.saw_sr = "sr" in out
        return [[{"mean": float(m), "text": f"M{float(m):.0f}"}]
                for m in out["mean"]]


def test_server_device_pool_ref_mode():
    """preload() stages frames in device memory; submit_ref() ships only an
    int32 index per request — the engine-rate serving path (VERDICT r3 #4).
    Results must route back to the right index, submit() must be rejected in
    ref mode, and out-of-range indices must raise at submit time."""
    rec = FakeFrozenRecognizer()
    cfg = ServeConfig(max_batch=4, max_delay_ms=20.0)
    with InferenceServer(rec, cfg) as srv:
        pool = np.stack([np.full((8, 8, 3), 10 * i, np.uint8)
                         for i in range(6)])
        assert srv.preload(pool) == 6
        futs = [srv.submit_ref(i) for i in [3, 0, 5, 1]]
        outs = [f.result(timeout=10) for f in futs]
        assert [o[0]["mean"] for o in outs] == [30.0, 0.0, 50.0, 10.0]
        # frame submission is rejected in ref mode
        with pytest.raises(ValueError):
            srv.submit(pool[0])
        with pytest.raises(IndexError):
            srv.submit_ref(6)
        with pytest.raises(IndexError):
            srv.submit_ref(-1)
        # batches are padded to the compiled size
        assert set(rec.batches) == {4}
        # mismatched pool shape rejected against the locked served shape
        with pytest.raises(ValueError):
            srv.preload(np.zeros((2, 4, 4, 3), np.uint8))
    assert srv.stats.requests == 4


def test_server_pool_requires_frozen_params():
    rec = FakeRecognizer()  # no _step_frozen
    with InferenceServer(rec, ServeConfig(max_batch=2)) as srv:
        with pytest.raises(ValueError):
            srv.preload(np.zeros((2, 8, 8, 3), np.uint8))
        with pytest.raises(ValueError):
            srv.submit_ref(0)


def test_server_return_sr_false_prunes_fetch():
    """ServeConfig.return_sr=False: the 'sr' leaf (the heavy SR crop images)
    is pruned from the output tree BEFORE device_get, so a text/boxes-only
    deployment never pays that device->host copy."""
    rec = FakeFrozenRecognizer()
    cfg = ServeConfig(max_batch=2, max_delay_ms=1.0, return_sr=False)
    with InferenceServer(rec, cfg) as srv:
        srv.preload(np.zeros((2, 8, 8, 3), np.uint8))
        assert srv.infer_ref(1)[0]["text"] == "M0"
    assert rec.saw_sr is False

    rec2 = FakeFrozenRecognizer()
    with InferenceServer(rec2, ServeConfig(max_batch=2,
                                           max_delay_ms=1.0)) as srv:
        srv.preload(np.zeros((2, 8, 8, 3), np.uint8))
        srv.infer_ref(0)
    assert rec2.saw_sr is True
