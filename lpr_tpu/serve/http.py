"""Minimal HTTP front-end for :class:`lpr_tpu.serve.server.InferenceServer`.

Network-compatible replacement for the reference's Triton HTTP surface
(``inference/triton_run.py:176`` connects to Triton on :8000).  Endpoints:

- ``GET  /v2/health/ready``            -> 200 when serving (Triton liveness
  check parity, triton_run.py:176-179)
- ``POST /v2/models/pipeline/infer``   -> body: raw .npy of an (H, W, 3)
  uint8 RGB frame; response: JSON list of plate dicts (box, score, text,
  text_sr)

stdlib-only (no extra deps); one thread per connection on top of the
dynamic-batching dispatch loop.
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

        def do_GET(self):
            if self.path == "/v2/health/ready":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"READY")
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/v2/models/pipeline/infer":
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                frame = np.load(io.BytesIO(body), allow_pickle=False)
                plates = server.infer(np.asarray(frame, np.uint8))
                out = [
                    {k: v for k, v in p.items() if k != "sr"} for p in plates
                ]
                payload = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(payload)
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
