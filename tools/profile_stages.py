"""Per-stage time budget for the fused pipeline at bench geometry.

Times each pipeline stage in isolation (scan-chained, like bench.py) so the
perf work targets the real bottleneck.  Run on the TPU:

    python tools/profile_stages.py
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def timed(name, fn, *args, steps=(10, 50)):
    """Scan-chain ``fn`` with the FIRST arg perturbed per step (prevents XLA
    hoisting the loop-invariant body out of the scan).

    Timed at TWO scan lengths and differenced: a single axon dispatch+fetch
    carries a ~26 ms fixed cost (measured round 4: the same conv program
    reads 2.72 ms/step chained x10 but 0.37 x100), which the two-point
    slope eliminates exactly — no RTT constant to subtract afterwards."""
    import jax
    import jax.numpy as jnp

    def run(n):
        def chained(*a):
            def body(acc, i):
                first = a[0] + i.astype(a[0].dtype)
                out = fn(first, *a[1:])
                dep = sum(jnp.asarray(x, jnp.float32).sum()
                          for x in jax.tree.leaves(out))
                return acc + dep, ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc

        f = jax.jit(chained)
        np.asarray(f(*args))
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return time.perf_counter() - t0

    n1, n2 = steps
    t1, t2 = run(n1), run(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"{name:28s} {dt*1e3:8.2f} ms/step")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply
    from lpr_tpu.models.yolo import build_yolo, load_char_ocr, yolov5_spec
    from lpr_tpu.ops import image as im
    from lpr_tpu.ops.nms import nms_batched
    from lpr_tpu.pipeline.recognizer import PipelineConfig, PlateRecognizer
    from lpr_tpu.weights.checkpoint import load_params

    B = int(os.environ.get("BENCH_BATCH", "32"))
    P = 3
    det_hw = (736, 1280)
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    plate_params = plate.init(key)
    demo = os.path.join(_REPO, "checkpoints", "demo_plate_s.npz")
    if os.path.exists(demo):
        plate_params = load_params(demo, plate_params)
    char, char_params, ck = load_char_ocr("/root/reference/weights/char.pt")
    lpsr_cfg = LPSRConfig()
    lpsr_params = load_lpsr("/root/reference/weights/best_model.pth", lpsr_cfg)

    cfg = PipelineConfig(det_hw=det_hw, dtype=dtype)
    rec = PlateRecognizer(plate, plate_params, char, char_params,
                          lpsr_params, lpsr_cfg, cfg, char_names=ck.names)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (B, 720, 1280, 3), np.uint8))

    total = timed("FULL step", lambda fr: rec._step(rec.params, fr), frames)

    # --- stage inputs -------------------------------------------------
    x = (frames.astype(dtype) / 255.0)
    lb, gain, pad = im.letterbox(x, det_hw, fill=0.0)
    lb = jax.device_get(lb)
    lbj = jnp.asarray(lb)

    t_det = timed("plate detector fwd (XLA)",
                  lambda a: plate.apply(rec.params["plate"], a)[0], lbj)
    if rec._front is not None:
        timed("plate detector fwd (front)",
              lambda a: plate.apply(rec.params["plate"], a,
                                    front=rec._front)[0], lbj)

    pred, _ = jax.jit(lambda a: plate.apply(rec.params["plate"], a))(lbj)
    pred = jnp.asarray(jax.device_get(pred))
    mask = rec.plate_mask
    t_nms = timed("plate NMS",
                  lambda p: nms_batched(p, 0.7, 0.3, max_det=16, pre_topk=64,
                                        multi_label=True, agnostic=True,
                                        class_mask=mask), pred)

    # geometry: random plausible boxes
    bx = rng.uniform(0, 1, (B, P, 4)).astype(np.float32)
    boxes = np.stack([
        bx[..., 0] * 1000, bx[..., 1] * 600,
        bx[..., 0] * 1000 + 60 + bx[..., 2] * 160,
        bx[..., 1] * 600 + 20 + bx[..., 3] * 60,
    ], -1)
    boxes = jnp.asarray(boxes)

    step_fn = rec._build_step()

    # isolate geometry by re-running internals: use the private per-plate
    from lpr_tpu.ops.resample import crop_rotated_fast, plate_tile

    def geom(xb, bxs):
        def pp(frame, box):
            tile, geomt = plate_tile(frame, box, cfg.tile_hw)
            coarse = crop_rotated_fast(frame, box, jnp.float32(0.0), (32, 96),
                                       tile=tile, tile_geom=geomt)
            gray = im.rgb_to_gray(coarse.astype(jnp.float32))
            w = box[2] - box[0]
            h = jnp.maximum(box[3] - box[1], 1.0)
            aspect = (w / 96.0) / (h / 32.0)
            angle = im.estimate_skew_angle(gray, max_abs_deg=15.0,
                                           pixel_aspect=aspect)
            full = crop_rotated_fast(frame, box, angle, cfg.sr_hw,
                                     tile=tile, tile_geom=geomt)
            topc = crop_rotated_fast(frame, box, angle,
                                     (cfg.sr_hw[0], cfg.sr_hw[1] // 2),
                                     tile=tile, tile_geom=geomt,
                                     v_range=(-0.5, 0.0))
            botc = crop_rotated_fast(frame, box, angle,
                                     (cfg.sr_hw[0], cfg.sr_hw[1] // 2),
                                     tile=tile, tile_geom=geomt,
                                     v_range=(0.0, 0.5))
            ocr_orig = crop_rotated_fast(frame, box, angle, cfg.ocr_hw,
                                         tile=tile, tile_geom=geomt,
                                         square=True, mask_outside=True)
            return full, topc, botc, ocr_orig
        return jax.vmap(jax.vmap(pp, in_axes=(None, 0)))(xb, bxs)

    t_geom = timed("crop/deskew geometry", geom, x, boxes)

    sr_in = jnp.asarray(rng.rand(B * P, 32, 192, 3).astype(np.float32))
    t_lpsr = timed("LPSR fwd (B*P crops)",
                   lambda a: lpsr_apply(rec.params["lpsr"], a, lpsr_cfg),
                   sr_in.astype(dtype))

    ocr_in = jnp.asarray(rng.rand(2 * B * P, 128, 128, 3).astype(np.float32))
    t_char = timed("char OCR fwd (2*B*P)",
                   lambda a: char.apply(rec.params["char"], a)[0],
                   ocr_in.astype(dtype))

    cpred, _ = jax.jit(lambda a: char.apply(rec.params["char"], a))(
        ocr_in.astype(dtype))
    cpred = jnp.asarray(jax.device_get(cpred))
    t_cnms = timed("char NMS (2*B*P)",
                   lambda p: nms_batched(p, 0.25, 0.3, max_det=16,
                                         pre_topk=128, multi_label=True,
                                         agnostic=True), cpred)

    t_lbox = timed("letterbox+norm",
                   lambda fr: im.letterbox(fr.astype(dtype) / 255.0, det_hw,
                                           fill=0.0)[0], frames)

    known = t_det + t_nms + t_geom + t_lpsr + t_char + t_cnms + t_lbox
    print(f"{'sum of stages':28s} {known*1e3:8.2f} ms/step")
    print(f"{'unaccounted':28s} {(total-known)*1e3:8.2f} ms/step")
    print(f"fps at full step: {B/total:.1f}")


if __name__ == "__main__":
    main()
