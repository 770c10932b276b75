"""Static memory planning — the TPU AutoBatch.

The reference binary-searches batch size from live CUDA memory profiling
(``yolov5/utils/autobatch.py:16-57``).  On TPU, memory is planned statically
at compile time: we estimate per-sample activation + param bytes by tracing
the model to a jaxpr (no device work, no compile) and summing intermediate
value sizes, then solve for the largest batch fitting the HBM budget.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np

V5E_HBM_BYTES = 16 * 1024**3


def traced_bytes(fn: Callable, *example_args) -> Tuple[int, int]:
    """(peak-ish activation bytes, output bytes) for fn(*example_args),
    estimated as the maximum single-equation live set in the jaxpr.

    Conservative but compile-free; XLA fusion/rematerialization only lowers
    real usage below this.
    """
    jaxpr = jax.make_jaxpr(fn)(*example_args)

    def size(aval):
        return int(np.prod(aval.shape)) * aval.dtype.itemsize if aval.shape else aval.dtype.itemsize

    total = 0
    peak = 0
    for eqn in jaxpr.jaxpr.eqns:
        out_b = sum(size(v.aval) for v in eqn.outvars)
        in_b = sum(size(v.aval) for v in eqn.invars if hasattr(v, "aval"))
        peak = max(peak, in_b + out_b)
        total += out_b
    out_bytes = sum(size(v.aval) for v in jaxpr.jaxpr.outvars)
    return peak, out_bytes


def autobatch(
    apply_fn: Callable,
    params,
    sample_shape: Tuple[int, ...],
    dtype=np.float32,
    hbm_bytes: int = V5E_HBM_BYTES,
    reserve: float = 0.35,
    max_batch: int = 1024,
) -> int:
    """Largest power-of-two batch whose estimated footprint fits
    ``(1-reserve) * hbm_bytes`` (reserve covers XLA workspace + params
    double-buffering)."""
    import jax.numpy as jnp

    param_bytes = sum(
        int(np.asarray(p).size) * np.asarray(p).dtype.itemsize
        for p in jax.tree.leaves(params)
    )
    x1 = jax.ShapeDtypeStruct((1, *sample_shape), dtype)
    peak1, out1 = traced_bytes(lambda x: apply_fn(params, x), x1)
    budget = hbm_bytes * (1.0 - reserve) - 2 * param_bytes
    if budget <= 0:
        return 1
    b = 1
    while b * 2 <= max_batch and (peak1 + out1) * (b * 2) <= budget:
        b *= 2
    return b
