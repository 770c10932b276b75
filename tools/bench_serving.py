"""Concurrent-stream serving benchmark: fps + p50/p99 under request load.

Proves the dynamic-batching dispatch loop (the Triton replacement,
``onnx_models/*/config.pbtxt`` dynamic_batching semantics) sustains the
device pipeline's throughput when fed by many independent clients rather
than one pre-staged tensor.  N client threads each stream frames
back-to-back (closed loop) through InferenceServer.submit(); the report is
one JSON line with client-side fps and the server's latency percentiles.

Usage:
  python tools/bench_serving.py [--clients 64] [--frames 20] \
      [--max-batch 32] [--platform tpu] [--http]

CAVEAT on this dev environment: the axon TPU is reached through a network
tunnel, so each 32-frame 720p batch ships ~88 MB host->device over it —
the measured serving fps here is the TUNNEL's bandwidth, not the engine
(which sustains 660+ fps device-side per bench.py).  On a real TPU host
the same loop feeds over PCIe.  The dispatch loop pipelines one batch
deep (batch N+1's transfer+compute dispatched before batch N's results
are fetched), which is the part this benchmark exercises functionally.
"""

import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_recognizer(det_hw, dtype_name, packed=False):
    import jax
    import jax.numpy as jnp

    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_init
    from lpr_tpu.models.yolo import (build_yolo, char_ocr_spec, load_char_ocr,
                                     yolov5_spec)
    from lpr_tpu.pipeline.recognizer import PipelineConfig, PlateRecognizer

    key = jax.random.PRNGKey(0)
    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    plate_params = plate.init(key)
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", "demo_plate_s.npz")
    if os.path.exists(demo):
        from lpr_tpu.weights.checkpoint import load_params

        plate_params = load_params(demo, plate_params)
    lpsr_cfg = LPSRConfig()
    ref_char = "/root/reference/weights/char.pt"
    if os.path.exists(ref_char):
        char, char_params, ck = load_char_ocr(ref_char)
        lpsr_params = load_lpsr("/root/reference/weights/best_model.pth",
                                lpsr_cfg)
        names = ck.names
    else:
        char = build_yolo(char_ocr_spec(),
                          ckpt_anchors=np.ones((1, 2, 2), np.float32) * 2,
                          strides=(8,))
        char_params = char.init(key)
        lpsr_params = lpsr_init(key, lpsr_cfg)
        names = None
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]

    def make(pk):
        cfg = PipelineConfig(det_hw=det_hw, dtype=dtype, packed_input=pk)
        return PlateRecognizer(plate, plate_params, char, char_params,
                               lpsr_params, lpsr_cfg, cfg, char_names=names)

    if packed:
        try:
            return make(True)
        except ValueError:  # fused front unavailable (CPU) -> XLA path
            pass
    return make(False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--frames", type=int, default=20,
                    help="frames per client (closed loop)")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-delay-ms", type=float, default=8.0)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--det-w", type=int, default=1280)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--http", action="store_true",
                    help="route via the HTTP front-end (adds network hop)")
    ap.add_argument("--files", action="store_true",
                    help="clients submit JPEG paths; the server's native "
                         "decode pool (lpr_native.cc) does JPEG->letterbox "
                         "on host threads, overlapped with the device "
                         "pipeline")
    ap.add_argument("--no-sr", action="store_true",
                    help="text/boxes-only serving: SR crop images are never "
                         "copied off the device (ServeConfig.return_sr=False)"
                         " — the dominant result-fetch bytes")
    ap.add_argument("--pool", action="store_true",
                    help="engine-rate mode: frames are preloaded into "
                         "device HBM once (InferenceServer.preload) and "
                         "clients submit int32 pool indices, taking the "
                         "host->device frame transfer (and on this dev box, "
                         "the tunnel) out of the serving loop — measures "
                         "the dispatch loop at the device pipeline's rate")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lpr_tpu.serve.http import HttpFrontend
    from lpr_tpu.serve.server import InferenceServer, ServeConfig

    h, w = args.frame_hw
    det_h = int(np.ceil(h * args.det_w / w / 32) * 32)
    rec = build_recognizer((det_h, args.det_w), args.dtype,
                           packed=args.pool)

    # one plate-bearing frame per client (synth), reused back-to-back
    from synth_plates import random_plate_text, render_frame_with_plates
    import random

    rng = random.Random(0)
    frames = []
    pw, ph = min(240, w // 2), min(64, h // 3)
    for _ in range(min(args.clients, 8)):
        t = random_plate_text(rng, False)
        x1 = rng.randint(0, w - pw - 1)
        y1 = rng.randint(0, h - ph - 1)
        frames.append(np.asarray(render_frame_with_plates(
            (h, w), [(t, False, (x1, y1, x1 + pw, y1 + ph))], rng),
            np.uint8))

    jpeg_paths = []
    if args.files:
        import tempfile

        from PIL import Image

        d = tempfile.mkdtemp(prefix="lpr_serve_bench_")
        for i, f in enumerate(frames):
            p = os.path.join(d, f"frame{i}.jpg")
            Image.fromarray(f).save(p, quality=90)
            jpeg_paths.append(p)
        from lpr_tpu.native import native_available

        print(f"# files mode: native decode "
              f"{'ON' if native_available() else 'OFF (PIL fallback)'}",
              file=sys.stderr)

    cfg = ServeConfig(max_batch=args.max_batch,
                      max_delay_ms=args.max_delay_ms,
                      queue_size=4 * args.clients, frame_hw=(h, w),
                      return_sr=not args.no_sr)
    with InferenceServer(rec, cfg) as srv:
        pool_n = 0
        if args.pool:
            pool_n = srv.preload(np.stack(frames))
            print(f"# pool mode: {pool_n} frames device-resident, "
                  f"packed={'packed' in srv._pool}", file=sys.stderr)
            # warmup: compile the ref-mode batch program before timing
            for f in [srv.submit_ref(0) for _ in range(args.max_batch)]:
                f.result()
        else:
            # warmup: compile the batch program before timing
            srv.infer_many(np.stack([frames[0]] * args.max_batch))
        srv.stats = type(srv.stats)()  # reset

        fe = HttpFrontend(srv, port=0).start() if args.http else None
        url = f"http://127.0.0.1:{fe.port}" if fe else None
        done = []
        lock = threading.Lock()

        def client(cid):
            import urllib.request

            f = frames[cid % len(frames)]
            buf = io.BytesIO()
            np.save(buf, f)
            payload = buf.getvalue()
            n_ok = 0
            for _ in range(args.frames):
                if fe:
                    req = urllib.request.Request(
                        url + "/v2/models/pipeline/infer", data=payload)
                    with urllib.request.urlopen(req) as r:
                        json.loads(r.read())
                elif args.pool:
                    srv.infer_ref(cid % pool_n)
                elif jpeg_paths:
                    srv.submit_path(
                        jpeg_paths[cid % len(jpeg_paths)]).result()
                else:
                    srv.infer(f)
                n_ok += 1
            with lock:
                done.append(n_ok)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        if fe:
            fe.stop()

        total = sum(done)
        s = srv.stats.summary()
        print(json.dumps({
            "metric": "serving_frames_per_sec",
            "value": round(total / dt, 2),
            "unit": "frames/s",
            "clients": args.clients,
            "mean_batch": s["mean_batch"],
            "latency_ms_p50": s["latency_ms_p50"],
            "latency_ms_p99": s["latency_ms_p99"],
            "transport": ("http" if fe
                          else "pool" if args.pool
                          else "files" if jpeg_paths else "inproc"),
        }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
