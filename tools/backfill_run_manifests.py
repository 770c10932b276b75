"""Backfill the committed det640 run manifests (VERDICT.md round-4 weak #2).

The round-4 training runs produced ``checkpoints/plate_det640.npz`` but
their committed manifests carried ``summary: null`` / ``artifacts: []`` /
``parent: null`` — the lineage lived only in markdown prose.  This tool
writes what is actually known, and nothing more:

- run-0000 (40 ep, from scratch): its /tmp checkpoints were overwritten by
  the follow-on runs; summary honestly records that its metrics were not
  retained.  It seeded run-0001.
- run-0001 (40 ep, warm-start run-0000): same; seeded run-0002.
- run-0002 (6 ep, warm-start run-0001, lr 2e-3): its best checkpoint IS
  the committed ``checkpoints/plate_det640.npz`` — logged as a sha256
  artifact with the round-4 validation numbers (640^2 val fitness 0.7981;
  production-rect 736x1280: mAP50 0.9876, mAP 0.7541, fitness 0.7774 —
  BENCHLOG.md round 4, tools/val_det_rect.py).

Idempotent; run from the repo root.  Usage:
  python tools/backfill_run_manifests.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lpr_tpu.utils.registry import RunRegistry

NOT_RETAINED = {
    "retained": False,
    "note": "pre-registry-era run: /tmp checkpoints overwritten by the "
            "follow-on warm-start run; val metrics not persisted",
}


def main():
    reg = RunRegistry("runs")

    r0 = reg.load("det640", "run-0000")
    if not r0.manifest.get("summary"):
        r0.finish(NOT_RETAINED)
        print("run-0000: summary backfilled (not-retained)")

    r1 = reg.load("det640", "run-0001")
    if r1.manifest.get("parent") is None:
        r1.manifest["parent"] = {
            "run_id": "det640/run-0000",
            "checkpoint": r1.manifest["config"].get("init_weights"),
            "sha256": None,  # file overwritten before hashing existed
        }
        r1.save()
        print("run-0001: parent backfilled")
    if not r1.manifest.get("summary"):
        r1.finish(NOT_RETAINED)
        print("run-0001: summary backfilled (not-retained)")

    r2 = reg.load("det640", "run-0002")
    if r2.manifest.get("parent") is None:
        r2.manifest["parent"] = {
            "run_id": "det640/run-0001",
            "checkpoint": r2.manifest["config"].get("init_weights"),
            "sha256": None,
        }
        r2.save()
        print("run-0002: parent backfilled")
    ckpt = "checkpoints/plate_det640.npz"
    if os.path.exists(ckpt) and not r2.artifact("best"):
        r2.log_artifact(ckpt, aliases=("best", "latest"), metrics={
            "val640_fitness": 0.7981,
            "rect736x1280_map50": 0.9876,
            "rect736x1280_map": 0.7541,
            "rect736x1280_fitness": 0.7774,
        })
        print("run-0002: plate_det640.npz artifact logged")
    if not r2.manifest.get("summary"):
        r2.finish({
            "epochs": 6,
            "final_fitness": 0.7981,
            "rect_map50": 0.9876,
            "rect_map": 0.7541,
        })
        print("run-0002: summary backfilled")
    print("done")


if __name__ == "__main__":
    main()
