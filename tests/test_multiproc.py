"""Multi-process (multi-host) data parallelism — the reference's multi-node
DDP equivalent (yolov5/train.py:60-62,535; SURVEY.md §2.8 "DCN only for
multi-host batch parallelism").

The core proof: an LPSR DP train step over 2 processes x 4 virtual CPU
devices (jax.distributed + gloo collectives) matches the single-process
8-device run to reduction-order tolerance, with the trainer code unchanged.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from lpr_tpu.parallel import multiproc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_slice_contract():
    # single-process: identity slice regardless of length
    assert multiproc.local_slice(8) == slice(0, 8)
    assert multiproc.local_slice(7) == slice(0, 7)


def test_initialize_from_env_noop_without_world_size(monkeypatch):
    monkeypatch.delenv("WORLD_SIZE", raising=False)
    assert multiproc.initialize_from_env() is False


def test_two_process_dp_matches_single_process():
    """2 procs x 4 devices == 1 proc x 8 devices (losses + updated params)."""
    single, multi = multiproc.multiproc_dp_check(
        n_processes=2, devices_per_process=4, timeout=560)
    assert multi["n_processes"] == 2
    assert multi["n_devices"] == 8
    assert single["n_devices"] == 8
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=2e-6)
