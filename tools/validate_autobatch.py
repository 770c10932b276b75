"""Validate autobatch's static memory plan against XLA's compiled footprint.

VERDICT r3 weak #7: ``utils/autobatch.py`` estimates per-sample activation
bytes from the jaxpr (compile-free, "conservative") but was never checked
against what XLA actually allocates.  This tool AOT-compiles the same
program at several batch sizes and reads ``compiled.memory_analysis()``
(argument/output/temp/alias bytes — the real HBM plan, reference equivalent:
the CUDA memory probe in ``yolov5/utils/autobatch.py:16-57``), then reports:

  * actual temp+output bytes per sample vs the jaxpr estimate (the safety
    ratio: >1 means the estimate over-reserves, <1 means it would OOM),
  * whether the batch autobatch() picks actually fits the device budget
    under the measured footprint.

Run on the TPU (falls back to the CPU backend's analysis if the axon
plugin returns no memory_analysis):

    python tools/validate_autobatch.py [--imgsz 640] [--train]
"""

import argparse
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _mem(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return None
    return {
        "args": int(m.argument_size_in_bytes),
        "out": int(m.output_size_in_bytes),
        "temp": int(m.temp_size_in_bytes),
        "alias": int(m.alias_size_in_bytes),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--train", action="store_true",
                   help="validate the TRAINING step (grads + SGD update), "
                        "the real autobatch use case, instead of forward")
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4, 16])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lpr_tpu.models.yolo import build_yolo, yolov5_spec
    from lpr_tpu.utils.autobatch import (V5E_HBM_BYTES, autobatch,
                                         traced_bytes)

    model = build_yolo(yolov5_spec(nc=11), strides=(8, 16, 32))
    params = model.init(jax.random.PRNGKey(0))
    param_bytes = sum(np.asarray(q).size * np.asarray(q).dtype.itemsize
                      for q in jax.tree.leaves(params))
    hw = (args.imgsz, args.imgsz)

    if args.train:
        from lpr_tpu.train.yolo_loss import YoloLossConfig, yolo_loss

        lcfg = YoloLossConfig()
        anchors = jnp.asarray(model.anchors)

        def step(pp, x, labels):
            # the same loss/grad/update shape as YoloTrainer.loss_fn
            # (train/yolo.py:94-101) minus optimizer state bookkeeping
            def loss_fn(q):
                raws, _ = model.apply(q, x, decode=False, train=True)
                raws = [r.astype(jnp.float32) for r in raws]
                return yolo_loss(raws, labels, anchors, lcfg)[0]
            loss, grads = jax.value_and_grad(loss_fn)(pp)
            new = jax.tree.map(lambda a, g: a - 0.01 * g, pp, grads)
            return loss, new

        def fn_at(b):
            x = jax.ShapeDtypeStruct((b, *hw, 3), jnp.float32)
            lb = jax.ShapeDtypeStruct((b, 16, 5), jnp.float32)
            return (lambda q, xx, ll: step(q, xx, ll)), (params, x, lb)
    else:
        def fn_at(b):
            x = jax.ShapeDtypeStruct((b, *hw, 3), jnp.float32)
            return (lambda q, xx: model.apply(q, xx)[0]), (params, x)

    # --- the static estimate autobatch uses ------------------------------
    f1, a1 = fn_at(1)
    peak1, out1 = traced_bytes(lambda *xs: f1(a1[0], *xs), *a1[1:])
    print(f"jaxpr estimate @batch1: peak {peak1/2**20:.1f} MiB + "
          f"out {out1/2**20:.1f} MiB; params {param_bytes/2**20:.1f} MiB")

    # --- the compiled truth at several batches ----------------------------
    rows = []
    for b in args.batches:
        f, a = fn_at(b)
        compiled = jax.jit(f).lower(*a).compile()
        m = _mem(compiled)
        if m is None:
            print(f"batch {b}: memory_analysis unavailable on "
                  f"{jax.devices()[0].platform}")
            continue
        per = (m["temp"] + m["out"]) / b
        rows.append((b, m, per))
        print(f"batch {b:3d}: args {m['args']/2**20:8.1f} MiB  "
              f"temp {m['temp']/2**20:8.1f} MiB  out {m['out']/2**20:7.1f}"
              f" MiB  -> temp+out/sample {per/2**20:7.1f} MiB")

    if not rows:
        raise SystemExit("no memory analysis available; nothing validated")

    # marginal per-sample footprint (slope between the two largest batches
    # — strips batch-independent workspace the same way autobatch's
    # per-sample scaling assumes)
    (b_lo, m_lo, _), (b_hi, m_hi, _) = rows[-2], rows[-1]
    slope = ((m_hi["temp"] + m_hi["out"]) - (m_lo["temp"] + m_lo["out"])) / (
        b_hi - b_lo)
    est = (peak1 + out1) * 1.6  # autobatch's calibrated layout_factor
    print(f"\nmarginal compiled footprint: {slope/2**20:.1f} MiB/sample; "
          f"estimate x1.6 layout factor {est/2**20:.1f} MiB/sample -> "
          f"safety ratio {est/slope:.2f}x "
          f"({'conservative (safe)' if est >= slope else 'UNDER-ESTIMATE'})")

    if not args.train:
        chosen = autobatch(lambda q, xx: model.apply(q, xx)[0], params,
                           (*hw, 3))
        budget = V5E_HBM_BYTES * (1 - 0.35) - 2 * param_bytes
        fits = m_hi["args"] - param_bytes + slope * chosen + (
            (m_hi["temp"] + m_hi["out"]) - slope * b_hi)
        print(f"autobatch() picks {chosen}; projected compiled footprint at "
              f"{chosen}: {fits/2**30:.2f} GiB vs {budget/2**30:.2f} GiB "
              f"budget -> {'FITS' if fits <= budget else 'DOES NOT FIT'}")


if __name__ == "__main__":
    main()
