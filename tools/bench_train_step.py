"""Training-step performance accounting on the real chip (round-5 item).

bench.py covers inference; this tool covers the other half of the
framework — the trainers (reference blueprint ``yolov5/train.py:65-643``
and ``train/lpsr.py``) — with the same honest-metrology rules:

- **detector**: yolov5s nc=11 at 640^2 / batch 16 with the FULL loss
  lattice (build_targets + 3-scale CIoU/obj/cls, EMA update included),
  i.e. the committed production training configuration;
- **lpsr**: the 310K-param LPSR at 192x32 / batch 128 (the committed
  training geometry).

For each: median step wall-time after warmup, model FLOPs from XLA's
compiled cost analysis, training MFU vs the v5e bf16 peak (197 TFLOP/s,
same convention as bench.py), plus the input-pipeline overlap verdict —
the measured host decode+augment rate (tools/bench_input.py: ~17.7
imgs/s/core at 640^2) against the images/s the chip can train, i.e. how
many host cores keep one chip busy.

Prints one JSON line per model.

Usage:  python tools/bench_train_step.py [--models det lpsr] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12
HOST_INPUT_RATE = 17.7  # imgs/s/core at 640^2, tools/bench_input.py


def _flops(jitted, *args) -> float:
    lo = jitted.lower(*args)
    ca = lo.cost_analysis()
    if not ca or "flops" not in ca:
        ca = lo.compile().cost_analysis()
    return float(ca["flops"])


def bench_det(iters: int):
    import jax
    import jax.numpy as jnp

    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer

    b, hw = 16, (640, 640)
    model = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    trainer = YoloTrainer(model, YoloTrainConfig(epochs=10),
                          steps_per_epoch=100)
    state = trainer.init()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (b, *hw, 3), np.uint8))
    # realistic label lattice: ~3 plates/frame, class 7/8
    labels = np.zeros((b, 64, 5), np.float32)
    for i in range(b):
        for t in range(3):
            labels[i, t] = [rng.choice([7, 8]), rng.uniform(0.2, 0.8),
                            rng.uniform(0.2, 0.8), rng.uniform(0.02, 0.2),
                            rng.uniform(0.02, 0.08)]
    labels = jnp.asarray(labels)

    # warmup/compile; axon block_until_ready does not sync -> fetch scalars.
    # Timing is CHAINED: dispatch `iters` dependent steps, fetch once, and
    # amortize — a per-step fetch would charge the tunnel's host round-trip
    # latency to every step (same metrology as bench.py).
    for _ in range(2):
        state, total, _ = trainer.step(state, images, labels)
    float(total)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, total, _ = trainer.step(state, images, labels)
    float(total)
    step_s = (time.perf_counter() - t0) / iters
    try:
        flops = _flops(trainer._train_step, state["params"],
                       state["momenta"], state["ema"], state["step"],
                       images, labels)
    except Exception:
        flops = float("nan")
    return dict(model="yolov5s_det640_b16", step_ms=round(step_s * 1e3, 2),
                imgs_per_s=round(b / step_s, 1), flops_per_step=flops)


def bench_lpsr(iters: int):
    import jax
    import jax.numpy as jnp

    from lpr_tpu.models.lpsr import LPSRConfig
    from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer

    b, hw = 128, (32, 192)
    trainer = LPSRTrainer(LPSRTrainConfig(), LPSRConfig())
    state = trainer.init()
    rng = np.random.RandomState(0)
    lr = jnp.asarray(rng.rand(b, *hw, 3).astype(np.float32))
    tg = jnp.asarray(rng.rand(b, *hw, 1).astype(np.float32))

    for _ in range(2):
        state, loss = trainer.step(state, lr, tg)
    float(loss)  # axon block_until_ready does not sync; fetch instead
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer.step(state, lr, tg)
    float(loss)
    step_s = (time.perf_counter() - t0) / iters
    try:
        flops = _flops(trainer._train_step, state["params"],
                       state["opt_state"], state["lr_scale"], lr, tg)
    except Exception:
        flops = float("nan")
    return dict(model="lpsr_192x32_b128", step_ms=round(step_s * 1e3, 2),
                imgs_per_s=round(b / step_s, 1), flops_per_step=flops)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["det", "lpsr"],
                    choices=["det", "lpsr"])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    for m in args.models:
        rec = bench_det(args.iters) if m == "det" else bench_lpsr(args.iters)
        step_s = rec["step_ms"] / 1e3
        if np.isfinite(rec["flops_per_step"]):
            rec["train_mfu_pct"] = round(
                100.0 * rec["flops_per_step"] / step_s / V5E_BF16_PEAK, 2)
        # overlap verdict: host cores needed to keep one chip training
        # (host rate measured at 640^2; LPSR crops are ~7x smaller than a
        # 640^2 frame per image so the rate scales accordingly)
        if m == "det":
            rec["host_cores_to_feed"] = round(
                rec["imgs_per_s"] / HOST_INPUT_RATE, 1)
            rec["verdict"] = ("input-bound on <"
                              f"{rec['host_cores_to_feed']} cores")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
