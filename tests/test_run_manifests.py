"""Committed run manifests must document the flagship artifacts.

VERDICT.md round-4 weak #2: the registry is only worth its code if the
production checkpoints' machine-readable lineage is complete — no
``summary: null`` in committed runs, and the committed flagship detector
checkpoint must be hash-pinned by some committed run's artifact entry.
"""

import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_JSONS = sorted(glob.glob(os.path.join(ROOT, "runs", "*", "run-*",
                                          "run.json")))


def test_committed_runs_exist():
    assert RUN_JSONS, "no committed run manifests"


@pytest.mark.parametrize("path", RUN_JSONS,
                         ids=[os.sep.join(p.split(os.sep)[-3:-1])
                              for p in RUN_JSONS])
def test_manifest_complete(path):
    with open(path) as f:
        m = json.load(f)
    assert m.get("summary"), f"{path}: summary is null/empty"
    assert m.get("run_id") and m.get("config") is not None
    # warm-started runs must record their parent
    init = (m.get("config") or {}).get("init_weights")
    if init:
        assert m.get("parent"), f"{path}: warm-start without parent lineage"


def test_flagship_detector_hash_pinned():
    """checkpoints/plate_det640.npz (the bench/entry detector) must be an
    artifact of a committed run, hash-matched to the committed file."""
    from lpr_tpu.utils.registry import file_sha256

    ckpt = os.path.join(ROOT, "checkpoints", "plate_det640.npz")
    digest = file_sha256(ckpt)
    for path in RUN_JSONS:
        with open(path) as f:
            m = json.load(f)
        for a in m.get("artifacts", []):
            if a["sha256"] == digest:
                assert a["metrics"], "flagship artifact has no metrics"
                return
    raise AssertionError("plate_det640.npz not hash-pinned by any "
                         "committed run manifest")
