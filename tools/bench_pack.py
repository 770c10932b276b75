"""Time the front-kernel input-pack variants + NMS stages on TPU.

    python tools/bench_pack.py [--batch 32]

Measures (scan-chained, best-of-3):
  - pack_front_frames       (XLA transpose chain)
  - pack_front_frames_conv  (stride-4 identity conv, NCHW out)
  - front_apply total with each pack
"""

import argparse
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


def timed(name, fn, *args, steps=20, reps=3):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        def body(acc, i):
            first = a[0] + i.astype(a[0].dtype)
            out = fn(first, *a[1:])
            dep = sum(jnp.asarray(x, jnp.float32).sum()
                      for x in jax.tree.leaves(out))
            return acc + dep, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(steps))
        return acc

    f = jax.jit(chained)
    np.asarray(f(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{name:40s} {best*1e3:8.2f} ms/step", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.ops.pallas.yolo_front import (front_fused, front_geom,
                                               front_pack_from_params,
                                               pack_front_frames,
                                               pack_front_frames_conv)
    from lpr_tpu.weights.checkpoint import load_params

    B = args.batch
    det_hw = (736, 1280)
    g = front_geom(*det_hw)

    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    params = plate.init(jax.random.PRNGKey(0))
    demo = os.path.join(_REPO, "checkpoints", "demo_plate_s.npz")
    if os.path.exists(demo):
        params = load_params(demo, params)
    packed = front_pack_from_params(plate, params)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, *det_hw, 3).astype(np.float32)).astype(
        jnp.bfloat16)

    timed("pack_front_frames (transpose)", pack_front_frames, x)
    timed("pack_front_frames_conv (MXU)", pack_front_frames_conv, x)
    timed("front: transpose pack + kernel",
          lambda a: front_fused(pack_front_frames(a), packed, geom=g), x)
    timed("front: conv pack + kernel",
          lambda a: front_fused(pack_front_frames_conv(a), packed, geom=g), x)


if __name__ == "__main__":
    main()
