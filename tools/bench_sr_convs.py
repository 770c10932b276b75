"""Roofline check for the two remaining named perf levers (VERDICT r3 #8):
LPSR small-channel convs at 192x32 and char-model convs at 128^2.

Measures each stage scan-chained at pipeline geometry (the bench protocol),
reads analytic FLOPs from XLA's HLO cost model, and reports achieved TF/s
vs the v5e bf16 peak — plus a per-shape microbench of the dominant conv
shapes so a kernel attempt has a precise target.  Decision rule (from the
round-3 mid-backbone negative): a Pallas attempt only makes sense where XLA
achieves well under ~15 TF/s on a shape whose operands could stay
VMEM-resident; at >=25 TF/s the quarter-grid machinery has nothing to win
(its front-kernel victory came from 3-32 channel layers XLA ran at 9.7).

Run on the TPU: python tools/bench_sr_convs.py
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

V5E_BF16_PEAK_TFS = 197.0


def timed_flops(name, fn, *args, steps=(10, 100)):
    """Scan-chained time of one application, fixed-cost-eliminated.

    A single axon dispatch+fetch carries a ~26 ms fixed cost (measured:
    the same conv reads 2.72 ms/step chained x10 but 0.37 x100), so a
    one-point read at small step counts is dominated by it.  Timing at two
    step counts and solving the 2x2 system yields the true per-step time
    with the fixed cost eliminated exactly.
    """
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
    dt = (t2 - t1) / (n2 - n1)  # fixed dispatch/fetch cost cancels

    flops = None
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        if cost:
            flops = cost.get("flops")
    except Exception:
        pass
    tfs = (flops / dt / 1e12) if flops else float("nan")
    pct = tfs / V5E_BF16_PEAK_TFS * 100 if flops else float("nan")
    print(f"{name:44s} {dt*1e3:8.3f} ms  "
          f"{(flops or 0)/1e9:7.2f} GF  {tfs:6.1f} TF/s ({pct:4.1f}% peak)")
    return dt, flops


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("platform:", jax.devices()[0].platform)

    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply
    from lpr_tpu.models.yolo import load_char_ocr
    from lpr_tpu.ops import nn as tnn

    B = int(os.environ.get("BENCH_BATCH", "32"))
    P = 3
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    lpsr_cfg = LPSRConfig()
    lpsr_params = load_lpsr("/root/reference/weights/best_model.pth",
                            lpsr_cfg)
    lpsr_params = jax.tree.map(lambda a: jnp.asarray(a, dtype), lpsr_params)
    char, char_params, _ = load_char_ocr("/root/reference/weights/char.pt")
    char_params = jax.tree.map(lambda a: jnp.asarray(a, dtype), char_params)

    # ---- stage-level: the two levers at pipeline geometry --------------
    sr_in = jnp.asarray(rng.rand(B * P, 32, 192, 3).astype(np.float32),
                        dtype)
    timed_flops(f"LPSR fwd ({B * P} crops, 32x192)",
                lambda a: lpsr_apply(lpsr_params, a, lpsr_cfg), sr_in)

    ocr_in = jnp.asarray(rng.rand(2 * B * P, 128, 128, 3).astype(np.float32),
                         dtype)
    timed_flops(f"char OCR fwd ({2 * B * P} canvases, 128^2)",
                lambda a: char.apply(char_params, a)[0], ocr_in)

    # ---- shape-level: dominant LPSR convs at batch geometry ------------
    # RDB dense chain (the serial growth convs; M=16 output channels) and
    # the CSAR 3x3 32->32 pair; plus the 7x7 shallow feature conv.
    n = B * P
    shapes = [
        ("dense 3x3  32->16", (n, 32, 192, 32), (3, 3, 32, 16)),
        ("dense 3x3  48->16", (n, 32, 192, 48), (3, 3, 48, 16)),
        ("dense 3x3  64->16", (n, 32, 192, 64), (3, 3, 64, 16)),
        ("dense 3x3  80->16", (n, 32, 192, 80), (3, 3, 80, 16)),
        ("csar  3x3  32->32", (n, 32, 192, 32), (3, 3, 32, 32)),
        ("sfe1  7x7   3->32", (n, 32, 192, 3), (7, 7, 3, 32)),
        ("lff   1x1  96->32", (n, 32, 192, 96), (1, 1, 96, 32)),
        ("char stem 12->16 (64^2)", (2 * n, 64, 64, 12), (3, 3, 12, 16)),
        ("char c3   32->32 (32^2)", (2 * n, 32, 32, 32), (3, 3, 32, 32)),
    ]
    for name, xs, ws in shapes:
        x = jnp.asarray(rng.rand(*xs).astype(np.float32), dtype)
        w = jnp.asarray(rng.rand(*ws).astype(np.float32) * 0.1, dtype)
        timed_flops(name, lambda a, w=w: tnn.conv2d(a, w), x)

    # ---- the serial-latency floor of one RDB dense chain ---------------
    # 8 chained matmul-equivalent convs (2 RDBs x 4 layers) cannot overlap;
    # measure one full RDB chain as composed in the model.
    from lpr_tpu.models.lpsr import _rdb  # noqa: use the real composition
    rdb_p = jax.tree.map(lambda a: a, lpsr_params["rdn"]["rdbs"][0])
    x32 = jnp.asarray(rng.rand(n, 32, 192, 32).astype(np.float32), dtype)
    timed_flops("one RDB chain (4 dense + lff)",
                lambda a: _rdb(rdb_p, a), x32)


if __name__ == "__main__":
    main()
