"""Device mesh + sharding helpers.

The reference's only distribution strategy is single-host DDP gradient
allreduce over NCCL/Gloo (``yolov5/train.py:254-256,535``; SURVEY.md §2.8).
The TPU-native equivalent is a 1-D ``data`` mesh over ICI: batches are
sharded on the leading axis, params are replicated, and XLA inserts the
gradient ``psum`` automatically from the sharding annotations — no explicit
collectives in user code.  Nothing in this workload needs model parallelism
(largest model ~7M params), so the mesh is deliberately 1-D; the helpers
below generalize to multi-host DCN meshes by passing explicit device lists.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with the leading axis sharded over the mesh.

    Single-process: the host array is the GLOBAL batch.  Multi-process
    (``jax.process_count() > 1``, i.e. after ``jax.distributed.initialize``):
    the host array is this process's LOCAL shard of the global batch — the
    same contract as the reference's DDP DistributedSampler feeding each rank
    its slice (``yolov5/utils/datasets.py:InfiniteDataLoader`` + sampler).
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate host values over every mesh device.  Works across processes
    (each process must pass the same value, as with DDP's identical module
    init on every rank)."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(batch: np.ndarray, mult: int):
    """Pad the leading axis up to a multiple of ``mult`` (static-shape
    batching across a mesh); returns (padded, real_count)."""
    b = batch.shape[0]
    rem = (-b) % mult
    if rem == 0:
        return batch, b
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), b
