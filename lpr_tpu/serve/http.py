"""Minimal HTTP front-end for :class:`lpr_tpu.serve.server.InferenceServer`.

Network-compatible replacement for the reference's Triton HTTP surface
(``inference/triton_run.py:176`` connects to Triton on :8000).  Endpoints:

- ``GET  /v2/health/ready``            -> 200 when serving (Triton liveness
  check parity, triton_run.py:176-179)
- ``POST /v2/models/pipeline/infer``   -> body: raw .npy of an (H, W, 3)
  uint8 RGB frame; response: JSON list of plate dicts (box, score, text,
  text_sr)
- ``POST /v2/models/pipeline/infer_batch`` -> body: raw .npy of a
  (B, H, W, 3) uint8 batch; response: JSON list (one plate list per frame).
  Frames share the dynamic-batching queue with single-frame requests.
- ``GET  /v2/stats``                   -> JSON ServerStats summary
  (throughput fps, mean batch, p50/p99 latency)

stdlib-only (no extra deps); one thread per connection on top of the
dynamic-batching dispatch loop.

Deployment note: like the reference's Triton config this surface carries
NO authentication, TLS, or request-size/backpressure limits — the dispatch
queue grows unboundedly under overload.  It is a trusted-network serving
shim; production deployments should front it with a reverse proxy that
terminates auth/TLS and enforces body-size + concurrency caps.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/v2/health/ready":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"READY")
            elif self.path == "/v2/stats":
                self._json(server.stats.summary())
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            single = self.path == "/v2/models/pipeline/infer"
            batched = self.path == "/v2/models/pipeline/infer_batch"
            if not (single or batched):
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)

            def strip(plates):
                return [{k: v for k, v in p.items() if k != "sr"}
                        for p in plates]

            try:
                arr = np.load(io.BytesIO(body), allow_pickle=False)
                arr = np.asarray(arr, np.uint8)
                if single:
                    out = strip(server.infer(arr))
                else:
                    if arr.ndim != 4:
                        raise ValueError(
                            f"infer_batch expects (B, H, W, 3), got {arr.shape}")
                    out = [strip(r) for r in server.infer_many(arr)]
                self._json(out)
            except Exception as e:  # noqa: BLE001
                self.send_response(400)
                self.end_headers()
                self.wfile.write(str(e).encode())

    return Handler


class HttpFrontend:
    def __init__(self, server, host: str = "127.0.0.1", port: int = 8000):
        self.httpd = ThreadingHTTPServer((host, port), make_handler(server))
        self.port = self.httpd.server_address[1]
        self._thread = None

    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=10)
