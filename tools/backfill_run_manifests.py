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

    if not os.path.exists("runs/det640/run-0000/run.json"):
        # the round-4 box's manifests were lost before ``runs/`` manifests
        # were force-added to git (runs/ is ignored for scratch runs):
        # reconstruct the known lineage honestly, marked as such
        reconstruct_det640(reg)
        backfill_det_chunked(reg)
        print("done (reconstructed)")
        return

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

    backfill_det_chunked(reg)
    print("done")


# round-5 photo-domain lineage (checkpoints/plate_det_photo.npz).  The
# chunked driver (scripts/train_det_chunked.sh) runs each chunk in a fresh
# process, so parent links span processes; interrupted exploration chunks
# never reached finish().  Chain: det640/run-0002 -> det-chunked/run-0000
# (lr .01, base photo set) -> run-0001 (lr .004) -> run-0002 (lr .0012,
# overlay-augmented regen; its best IS the shipped plate_det_photo.npz) ->
# run-0003 (booster mix, interrupted) -> run-0004 (obj-gain experiment,
# interrupted; demo-frame conf regressed 0.761 -> 0.637, not shipped).
_DET_CHUNKED_PARENTS = {
    "run-0000": "det640/run-0002",
    "run-0001": "det-chunked/run-0000",
    "run-0002": "det-chunked/run-0001",
    "run-0003": "det-chunked/run-0002",
    "run-0004": "det-chunked/run-0003",
}
_INTERRUPTED = {
    "run-0003": "interrupted mid-chunk (epoch 3 of 5) while exploring a "
                "booster-heavy mix; superseded by run-0002's shipped "
                "checkpoint",
    "run-0004": "interrupted obj-gain experiment (obj=1.6): val fitness "
                "rose but demo-frame conf regressed 0.761 -> 0.637; "
                "not shipped",
}


def reconstruct_det640(reg):
    """Recreate the det640 manifests from the recorded provenance
    (checkpoints/README.md row + BENCHLOG round 4).  The original
    process-written run.json files were never committed; these carry
    ``reconstructed: true`` so nobody mistakes them for live captures."""
    base = dict(arch="yolov5s", nc=11, imgsz=[640], batch_size=16,
                reconstructed=True)
    runs = [
        (dict(base, epochs=40, lr0=0.01, init_weights=None),
         None, NOT_RETAINED, None),
        (dict(base, epochs=40, lr0=0.01,
              init_weights="checkpoints/demo_plate_s.npz"),
         "det640/run-0000", NOT_RETAINED, None),
        (dict(base, epochs=6, lr0=0.002, init_weights="run-0001 best"),
         "det640/run-0001",
         {"epochs": 6, "final_fitness": 0.7981, "rect_map50": 0.9876,
          "rect_map": 0.7541},
         ("checkpoints/plate_det640.npz", {
             "val640_fitness": 0.7981, "rect736x1280_map50": 0.9876,
             "rect736x1280_map": 0.7541, "rect736x1280_fitness": 0.7774,
         })),
    ]
    for cfg, parent, summary, art in runs:
        r = reg.new_run("det640", cfg)
        if parent:
            r.manifest["parent"] = {"run_id": parent,
                                    "checkpoint": cfg.get("init_weights"),
                                    "sha256": None}
            r.save()
        if art and os.path.exists(art[0]):
            r.log_artifact(art[0], aliases=("best", "latest"),
                           metrics=art[1])
        r.finish(summary)
        print(f"{r.id}: reconstructed")


def backfill_det_chunked(reg):
    for rid, parent in _DET_CHUNKED_PARENTS.items():
        try:
            r = reg.load("det-chunked", rid)
        except FileNotFoundError:
            continue
        if r.manifest.get("parent") is None:
            r.manifest["parent"] = {
                "run_id": parent,
                "checkpoint": r.manifest["config"].get("init_weights"),
                "sha256": None,
            }
            r.save()
            print(f"det-chunked/{rid}: parent backfilled")
        if not r.manifest.get("summary"):
            r.finish({"retained": False, "note": _INTERRUPTED[rid]})
            print(f"det-chunked/{rid}: summary backfilled (interrupted)")
    r2 = reg.load("det-chunked", "run-0002")
    ckpt = "checkpoints/plate_det_photo.npz"
    names = [a["name"] for a in r2.manifest.get("artifacts", [])]
    if os.path.exists(ckpt) and "plate_det_photo" not in names:
        r2.log_artifact(ckpt, aliases=("shipped",), metrics={
            "adv_map50": 0.7897, "adv_map": 0.5164,
            "adv_fp_per_negative_frame": 0.0, "adv_op_recall": 0.501,
            "demo_frame_51A02352_conf_at_1920": 0.791,
        })
        print("det-chunked/run-0002: plate_det_photo.npz artifact logged")


if __name__ == "__main__":
    main()
