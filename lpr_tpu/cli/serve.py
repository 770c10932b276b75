"""Serving CLI — dynamic-batching pipeline server with HTTP front-end
(reference deployment path: Triton + ``inference/triton_run.py``)."""

from __future__ import annotations

import argparse
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serve the plate pipeline (TPU)")
    p.add_argument("--r-weights", required=True)
    p.add_argument("--sr-weights", required=True)
    p.add_argument("--d-weights", default=None)
    p.add_argument("--imgsz-det", type=int, default=1280)
    p.add_argument("--d-conf", type=float, default=0.4)   # triton_run.py:167
    p.add_argument("--r-conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)     # triton_run.py:169
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)      # Triton HTTP port
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from lpr_tpu.cli.run import build_recognizer
    from lpr_tpu.serve.http import HttpFrontend
    from lpr_tpu.serve.server import InferenceServer, ServeConfig

    rec = build_recognizer(args)
    srv = InferenceServer(
        rec, ServeConfig(max_batch=args.max_batch,
                         max_delay_ms=args.max_delay_ms)
    ).start()
    fe = HttpFrontend(srv, args.host, args.port).start()
    print(f"serving on http://{args.host}:{fe.port} "
          f"(POST /v2/models/pipeline/infer with an .npy RGB frame)")
    try:
        while True:
            time.sleep(30)
            s = srv.stats
            print(f"requests {s.requests} batches {s.batches} "
                  f"mean-batch {s.mean_batch:.2f} "
                  f"mean-latency {s.mean_latency_ms:.1f} ms")
    except KeyboardInterrupt:
        pass
    finally:
        fe.stop()
        srv.stop()


if __name__ == "__main__":
    main()
