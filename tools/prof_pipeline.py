"""Pipeline profiling variants (env-driven, one compile per invocation).

PROF_DET_HW=640   detector input size (default 1280)
PROF_BATCH=8      frames per step
PROF_STAGE=full|det_only|no_ocr|no_sr|no_geom
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpr_tpu_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
from lpr_tpu.models.yolo import build_yolo, load_char_ocr, yolov5_spec
from lpr_tpu.ops import image as im
from lpr_tpu.ops.nms import nms_batched
from lpr_tpu.pipeline.recognizer import PipelineConfig, PlateRecognizer


def main():
    det_hw = int(os.environ.get("PROF_DET_HW", "1280"))
    B = int(os.environ.get("PROF_BATCH", "8"))
    stage = os.environ.get("PROF_STAGE", "full")
    N = int(os.environ.get("PROF_STEPS", "10"))

    key = jax.random.PRNGKey(0)
    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    pp = plate.init(key)
    char, cp, ck = load_char_ocr("/root/reference/weights/char.pt")
    lpsr = load_lpsr("/root/reference/weights/best_model.pth")
    lpsr_cfg = LPSRConfig()
    cfg = PipelineConfig(det_hw=(det_hw, det_hw), dtype=jnp.bfloat16)
    rec = PlateRecognizer(plate, pp, char, cp, lpsr, lpsr_cfg, cfg,
                          char_names=ck.names)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (N, B, 720, 1280, 3), np.uint8))

    if stage == "full":
        body = lambda fr: jax.tree.leaves(
            jax.tree.map(lambda a: a.sum().astype(jnp.float32),
                         rec._step(rec.params, fr)))[0]
        def body(fr):
            out = rec._step(rec.params, fr)
            return (out["plate_boxes"].sum() + out["chars_sr"]["scores"].sum()
                    + out["sr"].mean()).astype(jnp.float32)
    elif stage == "det_only":
        def body(fr):
            x = im.uint8_to_float(fr)
            lb, g, p = im.letterbox(x, (det_hw, det_hw), fill=0.0)
            pred, _ = plate.apply(pp, lb.astype(jnp.bfloat16))
            return pred.sum().astype(jnp.float32)
    elif stage == "det_nms":
        def body(fr):
            x = im.uint8_to_float(fr)
            lb, g, p = im.letterbox(x, (det_hw, det_hw), fill=0.0)
            pred, _ = plate.apply(pp, lb.astype(jnp.bfloat16))
            det = nms_batched(pred, 0.7, 0.3, max_det=16, pre_topk=128,
                              class_mask=rec.plate_mask)
            return (det["boxes"].sum() + det["scores"].sum()).astype(jnp.float32)
    else:
        raise SystemExit(f"unknown stage {stage}")

    def chained(all_frames):
        def step(acc, fr):
            return acc + body(fr), ()
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), all_frames)
        return acc

    f = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(f(frames))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f(frames))
    dt = time.perf_counter() - t0
    print(f"stage={stage} det={det_hw} B={B}: {dt/N*1e3:.1f} ms/step "
          f"({B*N/dt:.1f} fps)  [compile {t_compile:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
