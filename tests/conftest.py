"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (SURVEY.md §4 test plan).
"""

import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS; jax.config.update works.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against fp32 torch outputs: force exact convs.
from lpr_tpu.ops import nn as _tnn

_tnn.set_default_precision("highest")

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

REF_LPSR = "/root/reference/weights/best_model.pth"
REF_CHAR = "/root/reference/weights/char.pt"


@pytest.fixture(scope="session")
def lpsr_golden():
    return np.load(FIXTURES / "lpsr_golden.npz")


@pytest.fixture(scope="session")
def char_yolo_golden():
    return np.load(FIXTURES / "char_yolo_golden.npz")


def has_ref_weights():
    return os.path.exists(REF_LPSR)


requires_ref = pytest.mark.skipif(
    not has_ref_weights(), reason="reference weights not mounted"
)
