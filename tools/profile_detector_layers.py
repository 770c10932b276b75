"""Per-layer time budget of the plate detector at bench geometry.

Times cumulative layer prefixes (scan-chained, frozen weights — the bench
protocol) so successive differences give each layer's cost; run on TPU:

    python tools/profile_detector_layers.py [--xla]  # --xla: no fused front
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


def timed(name, fn, *args, steps=10, reps=3):
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
    print(f"{name:34s} {best*1e3:8.2f} ms/step", flush=True)
    return best


def prefix_apply(model, params, x, upto, front=None, mid=None):
    """Run layers [0, upto] like YoloModel.apply (no Detect decode issues:
    upto < detect index for prefixes; full apply for the last row)."""
    from lpr_tpu.ops.pallas.yolo_front import front_apply
    from lpr_tpu.ops.pallas.yolo_mid import mid_apply

    saved = {}
    y = x
    start = 0
    if front is not None:
        y = front_apply(x, front)
        if 2 in model.save:
            saved[2] = y
        start = 3
        if upto < 3:
            return y
        if mid is not None:
            y = mid_apply(y, mid)
            if 4 in model.save:
                saved[4] = y
            start = 5
            if upto < 5:
                return y
    for l, p in zip(model.layers[start:upto + 1], params[start:upto + 1]):
        if l.f != -1:
            if isinstance(l.f, int):
                y = saved[l.f % len(model.layers)] if l.f >= 0 else y
            else:
                y = [y if j == -1 else saved[j % len(model.layers)]
                     for j in l.f]
        y = l(p, y)
        if l.i in model.save:
            saved[l.i] = y
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xla", action="store_true", help="disable fused front")
    ap.add_argument("--no-mid", action="store_true", help="front only")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lpr_tpu.models.yolo import Detect, build_yolo, yolov5_spec
    from lpr_tpu.ops.pallas.yolo_front import front_pack_from_params
    from lpr_tpu.ops.pallas.yolo_mid import mid_pack_from_params
    from lpr_tpu.weights.checkpoint import load_params

    B = args.batch
    det_hw = (736, 1280)
    dtype = jnp.bfloat16

    plate = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    params = plate.init(jax.random.PRNGKey(0))
    demo = os.path.join(_REPO, "checkpoints", "demo_plate_s.npz")
    if os.path.exists(demo):
        params = load_params(demo, params)
    front = None if args.xla else front_pack_from_params(plate, params)
    mid = None if (args.xla or args.no_mid) else mid_pack_from_params(
        plate, params)
    print(f"front kernel: {'OFF' if front is None else 'ON'}  "
          f"mid kernel: {'OFF' if mid is None else 'ON'}")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, *det_hw, 3).astype(np.float32)).astype(dtype)

    det_i = next(i for i, l in enumerate(plate.layers)
                 if isinstance(l, Detect))
    rows = [i for i in range(2, det_i)] + [det_i]
    prev = 0.0
    for upto in rows:
        l = plate.layers[upto]
        if upto == det_i:
            t = timed(f"[0..{upto}] full apply",
                      lambda a: plate.apply(params, a, front=front,
                                            mid=mid)[0], x)
        else:
            t = timed(
                f"[0..{upto}] {type(l).__name__:12s} "
                f"{getattr(l, 'c2', '')}",
                lambda a, u=upto: prefix_apply(plate, params, a, u,
                                               front=front, mid=mid), x)
        print(f"{'':34s} (+{(t - prev)*1e3:6.2f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
