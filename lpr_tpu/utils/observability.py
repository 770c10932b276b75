"""Tracing / profiling utilities.

Reference analogues (SURVEY.md §5.1): FPS counters from wall-clock deltas
(inference/run.py:262-266), cuda-sync'd stage timers
(yolov5/utils/torch_utils.py:101-105 time_sync), per-layer profiler
(yolov5/models/yolo.py:183-194).

TPU versions: an FPS meter, a stage timer that *forces a device fetch*
(``jax.block_until_ready`` is a no-op on the remote axon platform — fetching
a scalar is the only reliable sync), a ``jax.profiler`` trace context, and a
per-layer cost/param reporter from the model plan.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import numpy as np


def device_sync(tree: Any) -> None:
    """Reliably wait for device values (fetch one scalar per leaf group)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


class FpsMeter:
    """Rolling frames-per-second estimate (reference run.py:262-266)."""

    def __init__(self, alpha: float = 0.9):
        self.alpha = alpha
        self._fps: Optional[float] = None
        self._t: Optional[float] = None

    def tick(self, frames: int = 1) -> float:
        now = time.perf_counter()
        if self._t is not None:
            inst = frames / max(now - self._t, 1e-9)
            self._fps = (inst if self._fps is None
                         else self.alpha * self._fps + (1 - self.alpha) * inst)
        self._t = now
        return self._fps or 0.0


class StageTimer:
    """Accumulating per-stage wall timers with device sync."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, result_tree: Any = None):
        t0 = time.perf_counter()
        yield
        if result_tree is not None:
            device_sync(result_tree)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        rows = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            ms = 1000 * self.totals[k] / max(self.counts[k], 1)
            rows.append(f"{k:<24} {ms:8.2f} ms/call x{self.counts[k]}")
        return "\n".join(rows)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/lpr_tpu_trace"):
    """jax.profiler trace context (TensorBoard-compatible)."""
    try:
        jax.profiler.start_trace(logdir)
        yield logdir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def model_summary(model) -> str:
    """Per-layer param counts for a built YoloModel (the reference prints
    this from parse_model, yolo.py:260)."""
    import jax

    rows = [f"{'idx':>3} {'from':>10} {'params':>10}  type"]
    params = model.init(jax.random.PRNGKey(0))
    for layer, p in zip(model.layers, params):
        n = sum(int(np.asarray(x).size) for x in jax.tree.leaves(p))
        rows.append(
            f"{layer.i:>3} {str(layer.f):>10} {n:>10}  {type(layer).__name__}"
        )
    total = sum(int(np.asarray(x).size) for x in jax.tree.leaves(params))
    rows.append(f"total params: {total}")
    return "\n".join(rows)
