"""StableHLO model export — the TPU-native serving-format counterpart of
the reference's ONNX export (``my_utils/export_onnx.py``).

``jax.export`` serializes a jitted computation (with weights closed over or
as arguments) to a portable StableHLO artifact that any PJRT runtime can
load without Python model code — the deployment hand-off the reference uses
Triton/ONNX for.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_fn(fn: Callable, example_args: Sequence[Any], path: str) -> None:
    """Serialize ``jax.jit(fn)`` at the example shapes to ``path``."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn))(*example_args)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_fn(path: str) -> Callable:
    """Load a serialized artifact back into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def export_lpsr(params, path: str, batch: int = 16, hw=(32, 192),
                cfg=None) -> None:
    """Export the LPSR forward with weights baked in (the reference exports
    exactly this graph to onnx_models/sr/1/model.onnx)."""
    from lpr_tpu.models.lpsr import LPSRConfig, lpsr_apply

    cfg = cfg or LPSRConfig()
    params = jax.tree.map(jnp.asarray, params)

    def fn(x):
        return lpsr_apply(params, x, cfg)

    x = jnp.zeros((batch, hw[0], hw[1], 3), jnp.float32)
    export_fn(fn, (x,), path)


def export_detector(model, params, path: str, batch: int = 1,
                    hw=(1280, 1280), dtype=jnp.float32) -> None:
    """Export a YOLO forward (decode included, NMS excluded — matching the
    reference's detector ONNX contract, export_onnx.py:68-99)."""
    params = jax.tree.map(jnp.asarray, params)

    def fn(x):
        pred, _ = model.apply(params, x.astype(dtype))
        return pred.astype(jnp.float32)

    x = jnp.zeros((batch, hw[0], hw[1], 3), jnp.float32)
    export_fn(fn, (x,), path)
