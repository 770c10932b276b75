"""Regression floors for the adversarial held-out detector validation
(VERDICT r4 weak #1 / item 4).

``EVAL_det.json`` is the committed output of ``tools/val_det_adversarial.py``
run against ``checkpoints/plate_det_photo.npz`` on a held-out set from a
*different* generator configuration than training (seed universe 7770,
photographic backgrounds, 25% partial occlusions, 40% plate-free negative
frames, up to 4 plates/frame) — the numbers the product actually runs on,
including the false-positive rate at the ``cli/run.py`` conf-0.7 operating
point (reference ``inference/run.py:108``).

Round-5 measured values: mAP50 0.7897, mAP 0.5164, precision 0.8607,
0.000 FP per plate-free frame at conf 0.7, operating recall 0.501.
Floors sit comfortably below so generator/NMS/weights regressions are
caught without flaking on fp-reorder jitter.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL_DET = os.path.join(ROOT, "EVAL_det.json")


def test_adversarial_det_floors():
    with open(EVAL_DET) as f:
        r = json.load(f)
    assert r["weights"].endswith("plate_det_photo.npz")
    # the set must stay adversarial: negatives present, occlusions on
    assert r["config"]["neg_p"] >= 0.3 and r["config"]["occlude_p"] > 0
    assert r["negative_frames"] >= 100
    # floors (measured round 5: 0.7897 / 0.5164 / 0.0 / 0.501)
    assert r["map50"] >= 0.70
    assert r["map"] >= 0.45
    assert r["fp_per_negative_frame"] <= 0.05
    assert r["op_recall"] >= 0.40
