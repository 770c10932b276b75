"""Reading-order character assembly (host side).

Equivalent of reference ``my_utils/utils.py:7-72``
(sort_license_plate_detections): cluster detections into rows by center-y
gaps, sort each row left-to-right, flatten.  Operates on the fixed-shape
arrays produced by :mod:`lpr_tpu.ops.nms`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

OCR_CLASSES = tuple("0123456789abcdefghijklmnopqrstuvwxyz")
"""Class names of the char OCR detector (reference
``yolo_classes/ocr_class_names.txt``)."""


def reading_order(boxes: np.ndarray) -> np.ndarray:
    """Return the permutation putting boxes (N, 4) xyxy into reading order.

    Row threshold = max(10, (max_cy - min_cy) / 5), matching the reference
    (my_utils/utils.py:51-52).
    """
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64)
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    by_y = np.argsort(cy, kind="stable")
    thr = max(10.0, (cy[by_y[-1]] - cy[by_y[0]]) / 5.0)
    rows: List[List[int]] = [[by_y[0]]]
    for prev, cur in zip(by_y[:-1], by_y[1:]):
        if abs(cy[cur] - cy[prev]) > thr:
            rows.append([cur])
        else:
            rows[-1].append(cur)
    order = []
    for row in rows:
        row = sorted(row, key=lambda i: cx[i])
        order.extend(row)
    return np.asarray(order, np.int64)


def detections_to_string(
    boxes: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    names: Sequence[str] = OCR_CLASSES,
) -> str:
    """Fixed-shape NMS output -> plate string (uppercased, like
    reference inference/run.py:198)."""
    idx = np.nonzero(np.asarray(valid))[0]
    if len(idx) == 0:
        return ""
    b = np.asarray(boxes)[idx]
    c = np.asarray(classes)[idx]
    order = reading_order(b)
    return "".join(str(names[int(c[i])]).upper() for i in order)


def detections_to_string_conf(
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: np.ndarray,
    valid: np.ndarray,
    names: Sequence[str] = OCR_CLASSES,
) -> Tuple[str, float]:
    """Like :func:`detections_to_string` but also returns the mean char
    confidence (reference evaluation/find_improvement.py average-confidence
    gating)."""
    idx = np.nonzero(np.asarray(valid))[0]
    if len(idx) == 0:
        return "", 0.0
    b = np.asarray(boxes)[idx]
    c = np.asarray(classes)[idx]
    s = np.asarray(scores)[idx]
    order = reading_order(b)
    text = "".join(str(names[int(c[i])]).upper() for i in order)
    return text, float(s.mean())
