"""Failure detection for long training runs.

The reference has essentially none (SURVEY.md §5.3) — its closest analogues
are the NMS wall-clock bailout and per-image try/except in batch scripts.
A production TPU trainer needs real guards:

- :func:`tree_all_finite` — device-side NaN/Inf check over a pytree (one
  fused reduction, negligible cost).
- :class:`StepGuard` — skip/halt policy on non-finite losses, with
  consecutive-failure escalation.
- :func:`auto_resume_latest` — find the most recent checkpoint in a run dir
  (the reference's AWS resume helper, ``yolov5/utils/aws/resume.py:1-40``,
  and ``--resume`` auto-find, ``train.py:507-512``).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp


def tree_all_finite(tree: Any) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(
                  jnp.asarray(x).dtype, jnp.inexact)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


class StepGuard:
    """Skip steps with non-finite loss; halt after ``max_consecutive``."""

    def __init__(self, max_consecutive: int = 10):
        self.max_consecutive = max_consecutive
        self.bad_streak = 0
        self.total_skipped = 0

    def check(self, loss: float) -> bool:
        """True if the step is healthy; raises after too many bad steps."""
        import math

        if math.isfinite(float(loss)):
            self.bad_streak = 0
            return True
        self.bad_streak += 1
        self.total_skipped += 1
        if self.bad_streak >= self.max_consecutive:
            raise FloatingPointError(
                f"{self.bad_streak} consecutive non-finite losses "
                f"({self.total_skipped} total) — halting training"
            )
        return False


def auto_resume_latest(run_dir: str, pattern: str = "*.npz") -> Optional[str]:
    """Most recently modified checkpoint under run_dir, or None."""
    paths = glob.glob(os.path.join(run_dir, "**", pattern), recursive=True)
    if not paths:
        return None
    return max(paths, key=os.path.getmtime)
