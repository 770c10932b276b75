"""Train a small demo plate detector on synthetic street frames.

The reference's plate-detector weights (weights/object.pt) are a missing
blob upstream; this script trains a yolov5n-scale stand-in (nc=11, plate
classes 7/8 like the reference class map) on synthetic frames so the full
pipeline (detect -> crop/deskew -> LPSR -> OCR) runs end-to-end with every
stage live.  Output: checkpoints/demo_plate.npz (+ a quick self-check).

Usage: python tools/train_demo_detector.py [--steps 400] [--imgsz 320]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(rng: random.Random, batch: int, imgsz: int, max_labels: int = 8):
    from tools.synth_plates import random_plate_text, render_frame_with_plates

    imgs = np.zeros((batch, imgsz, imgsz, 3), np.float32)
    labels = np.zeros((batch, max_labels, 5), np.float32)
    for b in range(batch):
        plates = []
        n = rng.randint(1, 2)
        for k in range(n):
            two = rng.random() < 0.4
            t = random_plate_text(rng, two)
            if two:
                w = rng.randint(50, 90)
                h = int(w * rng.uniform(0.6, 0.8))
            else:
                w = rng.randint(80, 160)
                h = int(w * rng.uniform(0.22, 0.35))
            x1 = rng.randint(0, imgsz - w - 1)
            y1 = rng.randint(0, imgsz - h - 1)
            plates.append((t, two, (x1, y1, x1 + w, y1 + h)))
            cls = 7.0 if two else 8.0  # square / rectangle license plate
            labels[b, k] = [cls, (x1 + w / 2) / imgsz, (y1 + h / 2) / imgsz,
                            w / imgsz, h / imgsz]
        frame = render_frame_with_plates((imgsz, imgsz), plates, rng)
        imgs[b] = frame.astype(np.float32) / 255.0
    return imgs, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--lr0", type=float, default=0.01)
    ap.add_argument("--out", default="checkpoints/demo_plate.npz")
    ap.add_argument("--size", default="n", choices=list("nsmlx"),
                    help="yolov5 scale preset (bench uses s)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (the axon plugin ignores "
                    "JAX_PLATFORM* env vars; only jax.config works)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpr_tpu_jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer, validate_map
    from lpr_tpu.weights.checkpoint import save_params

    from lpr_tpu.models.yolo import _SIZE_PRESETS

    depth, width = _SIZE_PRESETS[args.size]
    model = build_yolo(yolov5_spec(nc=11, depth=depth, width=width),
                       strides=(8, 16, 32))
    trainer = YoloTrainer(
        model,
        YoloTrainConfig(lr0=args.lr0, warmup_epochs=0.3,
                        epochs=max(args.steps // 50, 1)),
        steps_per_epoch=50,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    rng = random.Random(0)
    for it in range(args.steps):
        imgs, labels = make_batch(rng, args.batch, args.imgsz)
        state, total, comps = trainer.step(
            state, jnp.asarray(imgs), jnp.asarray(labels)
        )
        if it % 25 == 0:
            print(f"step {it}: loss {float(total):.4f} "
                  f"(box {float(comps['box']):.3f} obj {float(comps['obj']):.3f} "
                  f"cls {float(comps['cls']):.3f})", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_params(args.out, state["ema"])
    print("saved", args.out)

    # self-check mAP on fresh synthetic frames
    val = [make_batch(rng, args.batch, args.imgsz) for _ in range(2)]
    metrics = validate_map(model, state["ema"], val, conf_thres=0.01)
    print(f"val mAP50 {metrics['map50']:.3f} mAP {metrics['map']:.3f}")


if __name__ == "__main__":
    main()
