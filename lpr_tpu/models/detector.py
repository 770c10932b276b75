"""Convenience single-model detector wrapper.

The TPU counterpart of the reference ``Detection`` class
(``my_models/detection.py:12-99``: load weights, aspect-pad preprocess,
forward, NMS, coordinate rescale, label mapping) and the AutoShape-style
results object (``yolov5/models/common.py:477-664``): hand it frames, get
back name/conf/box tuples in original-image coordinates.

All device work (letterbox, forward, decode, NMS, coord rescale) is one jit;
only the final tiny arrays reach the host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.models.yolo import YoloModel
from lpr_tpu.ops import image as im
from lpr_tpu.ops.boxes import clip_boxes
from lpr_tpu.ops.nms import nms_batched


@dataclasses.dataclass
class DetectionResult:
    """One image's detections (AutoShape Detections equivalent)."""

    names: List[str]
    boxes: np.ndarray    # (n, 4) xyxy in original image px
    scores: np.ndarray   # (n,)
    classes: np.ndarray  # (n,) int

    def __len__(self):
        return len(self.boxes)

    def tolist(self) -> List[List[Any]]:
        """Reference Detection.char_detection_yolo output format:
        [name, str(conf), (x1, y1, x2, y2)] (detection.py:64-70)."""
        return [
            [self.names[int(c)], str(float(s)), tuple(float(v) for v in b)]
            for b, s, c in zip(self.boxes, self.scores, self.classes)
        ]

    def pandas(self):
        """Records like AutoShape's .pandas() (dict rows; no pandas dep)."""
        return [
            {"xmin": float(b[0]), "ymin": float(b[1]), "xmax": float(b[2]),
             "ymax": float(b[3]), "confidence": float(s),
             "class": int(c), "name": self.names[int(c)]}
            for b, s, c in zip(self.boxes, self.scores, self.classes)
        ]


class Detector:
    """size/conf/iou mirror the reference Detection constructor
    (detection.py:13-26)."""

    def __init__(
        self,
        model: YoloModel,
        params,
        names: Sequence[str],
        size: Tuple[int, int] = (640, 640),
        conf_thres: float = 0.25,
        iou_thres: float = 0.45,
        max_det: int = 300,
        dtype=jnp.bfloat16,
        agnostic: bool = True,
        multi_label: bool = True,
    ):
        self.model = model
        self.params = params
        self.names = list(names)
        self.size = size

        def step(params, frames):
            x = im.uint8_to_float(frames)
            fh, fw = x.shape[1], x.shape[2]
            lb, gain, pad = im.letterbox(x, size, fill=0.0)
            pred, _ = model.apply(params, lb.astype(dtype))
            det = nms_batched(
                pred, conf_thres, iou_thres, max_det=max_det,
                pre_topk=min(512, pred.shape[1]),
                multi_label=multi_label, agnostic=agnostic,
            )
            boxes = (det["boxes"] - jnp.concatenate([pad, pad])) / gain
            det["boxes"] = jnp.round(clip_boxes(boxes, fh, fw))
            return det

        self._step = jax.jit(step)

    def detect_batch(self, frames: np.ndarray) -> List[DetectionResult]:
        """frames: (B, H, W, 3) uint8 RGB."""
        det = jax.device_get(self._step(self.params, jnp.asarray(frames)))
        out = []
        for i in range(frames.shape[0]):
            n = int(det["count"][i])
            out.append(DetectionResult(
                self.names, det["boxes"][i][:n], det["scores"][i][:n],
                det["classes"][i][:n],
            ))
        return out

    def detect(self, frame: np.ndarray) -> DetectionResult:
        """Single frame (reference Detection.detect)."""
        return self.detect_batch(frame[None])[0]


def load_char_detector(path: str, size=(128, 128), conf_thres=0.25,
                       iou_thres=0.3, **kw) -> Detector:
    """Reference usage: Detection(weights_path=char.pt, size=(128,128))."""
    from lpr_tpu.models.yolo import load_char_ocr

    model, params, ck = load_char_ocr(path)
    return Detector(model, params, ck.names, size, conf_thres, iou_thres, **kw)
