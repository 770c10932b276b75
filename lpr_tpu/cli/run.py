"""End-to-end pipeline CLI — TPU counterpart of reference ``inference/run.py``.

Reads a video file or image folder, runs the fused batched recognizer, and
writes annotated frames (+ optional side panels) to an output directory.
Differences from the reference by design: frames are processed in device
batches (not one at a time), the display is file output instead of a cv2
window, and every geometric stage runs on-TPU.

Usage:
  python -m lpr_tpu.cli.run --source video.mp4 --d-weights plate.npz \\
      --r-weights /root/reference/weights/char.pt \\
      --sr-weights /root/reference/weights/best_model.pth --out out/
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Iterator, List

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="License-plate recognition (TPU)")
    p.add_argument("--d-weights", type=str, default=None,
                   help="Plate detector weights (.npz native / .pt torch); "
                        "random init if omitted (upstream object.pt is a "
                        "missing blob)")
    p.add_argument("--r-weights", type=str, required=True,
                   help="Char OCR weights (char.pt or .npz)")
    p.add_argument("--sr-weights", type=str, required=True,
                   help="LPSR weights (.pth or .npz)")
    p.add_argument("--source", type=str, required=True,
                   help="Video file or image folder")
    p.add_argument("--out", type=str, default="out")
    p.add_argument("--imgsz-det", type=int, default=1280)   # run.py:108
    p.add_argument("--d-conf", type=float, default=0.7)     # run.py:110
    p.add_argument("--r-conf", type=float, default=0.25)    # run.py:111
    p.add_argument("--iou", type=float, default=0.3)        # run.py:112
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--panel", action="store_true",
                   help="also write per-frame detail panels")
    p.add_argument("--step", action="store_true",
                   help="interactive stepping: pause after each annotated "
                        "frame and wait for Enter on stdin ('q' quits) — "
                        "the headless counterpart of the reference's "
                        "per-frame keypress loop (inference/run.py:273-277)")
    return p.parse_args(argv)


def frame_source(source: str) -> Iterator[np.ndarray]:
    """Yield RGB uint8 frames — source router like the reference detect CLI
    (yolov5/detect.py:80-100): image folder, single image, video file,
    stream URL (rtsp/http), or webcam index."""
    if os.path.isdir(source):
        from PIL import Image

        for f in sorted(os.listdir(source)):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                yield np.asarray(
                    Image.open(os.path.join(source, f)).convert("RGB")
                )
        return
    if source.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
        from PIL import Image

        yield np.asarray(Image.open(source).convert("RGB"))
        return
    import cv2

    cap = cv2.VideoCapture(int(source) if source.isdigit() else source)
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield frame[:, :, ::-1]  # BGR -> RGB
    finally:
        cap.release()


def build_recognizer(args):
    import jax.numpy as jnp

    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.models.yolo import build_yolo, load_char_ocr, yolov5_spec
    from lpr_tpu.pipeline.recognizer import PipelineConfig, PlateRecognizer
    from lpr_tpu.weights.checkpoint import load_params

    import jax

    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    plate_params = plate.init(jax.random.PRNGKey(0))
    if args.d_weights and args.d_weights.endswith(".npz"):
        plate_params = load_params(args.d_weights, plate_params)

    char, char_params, ck = load_char_ocr(args.r_weights)
    lpsr_cfg = LPSRConfig()
    lpsr_params = load_lpsr(args.sr_weights, lpsr_cfg)
    cfg = PipelineConfig(
        det_hw=(args.imgsz_det, args.imgsz_det),
        det_conf=args.d_conf, ocr_conf=args.r_conf, iou=args.iou,
        dtype=jnp.bfloat16,
    )
    return PlateRecognizer(plate, plate_params, char, char_params,
                           lpsr_params, lpsr_cfg, cfg, char_names=ck.names)


def _step_pause(idx: int) -> bool:
    """Block until the user presses Enter; return False to stop the run.

    Mirrors the reference's frame-by-frame keypress stepping
    (``inference/run.py:273-277``: ``cv2.waitKey(0)``, 'q' breaks) for a
    headless environment: the pause reads a line from stdin instead of a
    cv2 window event.  EOF also stops, so piped input terminates cleanly.
    """
    try:
        line = input(f"[frame {idx}] Enter=next, q=quit> ")
    except EOFError:
        return False
    return not line.strip().lower().startswith("q")


def main(argv=None):
    args = parse_args(argv)
    from lpr_tpu.pipeline.annotate import annotate_frame, side_panel
    from PIL import Image

    rec = build_recognizer(args)
    os.makedirs(args.out, exist_ok=True)

    batch: List[np.ndarray] = []
    idx = 0
    stopped = False
    t_last = time.perf_counter()
    fps = 0.0

    def flush(frames: List[np.ndarray]):
        nonlocal idx, fps, t_last, stopped
        n = len(frames)
        padded = frames + [frames[-1]] * (args.batch - n)
        results = rec.recognize(np.stack(padded))[:n]
        now = time.perf_counter()
        fps = n / (now - t_last)
        t_last = now
        for f, plates in zip(frames, results):
            ann = annotate_frame(f, plates, fps=fps)
            Image.fromarray(ann).save(
                os.path.join(args.out, f"frame_{idx:06d}.jpg"), quality=90
            )
            if args.panel and plates:
                Image.fromarray(side_panel(plates)).save(
                    os.path.join(args.out, f"panel_{idx:06d}.jpg"), quality=90
                )
            for p in plates:
                print(f"frame {idx}: {p['text']!r} / SR {p['text_sr']!r} "
                      f"conf {p['score']:.2f}")
            idx += 1
            if args.step and not _step_pause(idx - 1):
                stopped = True
                return
        if args.step:
            # don't charge the human pause time to the next flush's fps
            t_last = time.perf_counter()

    for frame in frame_source(args.source):
        batch.append(frame)
        if len(batch) < args.batch:
            continue
        assert len({b.shape for b in batch}) == 1, "mixed frame sizes"
        flush(batch)
        batch.clear()
        if stopped or (args.max_frames and idx >= args.max_frames):
            break
    if batch and not stopped and not (args.max_frames and idx >= args.max_frames):
        flush(batch)  # trailing partial batch (padded to compiled shape)
    print(f"done: {idx} frames -> {args.out} (last fps {fps:.1f})")


if __name__ == "__main__":
    main()
