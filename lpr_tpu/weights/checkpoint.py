"""Native checkpoint format: flat npz of the params pytree.

Replaces the reference's pickled torch saves (``train/lpsr.py:193-201``,
``train/cyclegans.py:188-196``) with a safe, torch-free format; the
PyTorch-import shim for the shipped reference weights lives in
:mod:`lpr_tpu.weights.torch_ckpt`.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def save_params(path: str, params: Any, **extras: Any) -> None:
    """Save a params pytree; ``extras`` adds side-channel arrays (keys that
    cannot collide with flattened param paths, e.g. ``__anchors__``) which
    :func:`load_params` ignores."""
    np.savez_compressed(path, **_flatten(params), **extras)


def load_params(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (same treedef)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_k, leaf in flat:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path_k
        )
        arr = data[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
