"""Accuracy harness: full-plate accuracy + CER, with and without SR.

Re-implements the reference evaluation protocol (``evaluation/eval.py``):
ground truth = filename stem uppercased (eval.py:23-25); per image two OCR
paths — raw plate image vs LPSR-enhanced — scored by exact full-plate match
and character error rate (Levenshtein / len(gt), eval.py:28-33,125-131).

TPU re-design: all images are preprocessed to fixed-shape canvases on the
host once, then the whole eval set runs through ONE jitted batched program
(OCR-on-original + SR + OCR-on-SR per batch) instead of per-image
host<->device ping-pong.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.models.lpsr import LPSRConfig, lpsr_apply
from lpr_tpu.models.yolo import YoloModel
from lpr_tpu.ops import image as im
from lpr_tpu.ops.nms import nms_batched
from lpr_tpu.pipeline.chars import (
    OCR_CLASSES,
    detections_to_string,
    detections_to_string_conf,
)


def levenshtein(a: str, b: str) -> int:
    """Edit distance (plain DP; no external dependency)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def cer(gt: str, pred: str) -> float:
    """Character error rate (reference eval.py:28-33)."""
    if not gt:
        return 1.0 if pred else 0.0
    return levenshtein(gt, pred) / len(gt)


@dataclasses.dataclass
class EvalReport:
    n: int
    acc_raw: float
    acc_sr: float
    cer_raw: float
    cer_sr: float
    per_image: List[Dict]

    def summary(self) -> str:
        return (
            f"n={self.n}  accuracy raw={self.acc_raw*100:.2f}% "
            f"sr={self.acc_sr*100:.2f}% (+{(self.acc_sr-self.acc_raw)*100:.2f})  "
            f"CER raw={self.cer_raw*100:.2f}% sr={self.cer_sr*100:.2f}% "
            f"({(self.cer_sr-self.cer_raw)*100:+.2f})"
        )


class OcrEvaluator:
    """Batched two-path OCR evaluator.

    Parameters mirror the reference defaults: ocr at 128^2, conf 0.5 per the
    published protocol (README.md:240; note scripts/eval_sr.sh used 0.45),
    iou 0.3, SR input 192x32.
    """

    def __init__(
        self,
        char_model: YoloModel,
        char_params,
        lpsr_params,
        lpsr_cfg: LPSRConfig = LPSRConfig(),
        ocr_hw: Tuple[int, int] = (128, 128),
        sr_hw: Tuple[int, int] = (32, 192),
        ocr_conf: float = 0.5,
        iou: float = 0.3,
        max_chars: int = 16,
        names: Sequence[str] = OCR_CLASSES,
        dtype=jnp.float32,
    ):
        self.char_model = char_model
        self.params = {"char": char_params, "lpsr": lpsr_params}
        self.lpsr_cfg = lpsr_cfg
        self.ocr_hw = ocr_hw
        self.sr_hw = sr_hw
        self.names = names

        oh, ow = ocr_hw
        sh, sw = sr_hw

        def batch_fn(params, ocr_canvas, sr_in):
            # path 2: SR -> gray -> RGB canvas -> OCR
            sr = lpsr_apply(params["lpsr"], sr_in.astype(dtype), lpsr_cfg)
            sr = sr.astype(jnp.float32)
            rgb = jnp.repeat(sr, 3, axis=-1) if sr.shape[-1] == 1 else sr
            # quantize like the reference's uint8 round-trip (eval.py:118-120)
            rgb = im.uint8_to_float(im.float_to_uint8(rgb))
            scale = min(oh / sh, ow / sw)
            nh, nw = int(round(sh * scale)), int(round(sw * scale))
            resized = im.resize_bilinear(rgb, (nh, nw))
            canvas = jnp.zeros((rgb.shape[0], oh, ow, 3), jnp.float32)
            canvas = jax.lax.dynamic_update_slice(
                canvas, resized, (0, (oh - nh) // 2, (ow - nw) // 2, 0)
            )
            both = jnp.concatenate([ocr_canvas, canvas], axis=0)
            pred, _ = self.char_model.apply(params["char"], both.astype(dtype))
            det = nms_batched(pred, ocr_conf, iou, max_det=max_chars,
                              pre_topk=256, multi_label=True, agnostic=True)
            return det, sr

        self._batch_fn = jax.jit(batch_fn)

    # ------------------------------------------------------------------
    def _prep_host(self, img_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host preprocessing of one RGB uint8 image: OCR aspect canvas +
        bicubic SR input (reference preprocess_for_sr, eval.py:36-46)."""
        from PIL import Image

        oh, ow = self.ocr_hw
        sh, sw = self.sr_hw
        h, w = img_u8.shape[:2]
        pil = Image.fromarray(img_u8)
        scale = min(oh / h, ow / w)
        nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
        canvas = np.zeros((oh, ow, 3), np.float32)
        rs = np.asarray(pil.resize((nw, nh), Image.BILINEAR), np.float32) / 255.0
        t, l = (oh - nh) // 2, (ow - nw) // 2
        canvas[t : t + nh, l : l + nw] = rs
        sr_in = np.asarray(pil.resize((sw, sh), Image.BICUBIC), np.float32) / 255.0
        return canvas, sr_in

    def evaluate_arrays(
        self, images: Sequence[np.ndarray], gts: Sequence[str],
        batch_size: int = 64,
    ) -> EvalReport:
        n = len(images)
        per_image: List[Dict] = []
        acc_r = acc_s = 0
        cer_r = cer_s = 0.0
        for start in range(0, n, batch_size):
            chunk = images[start : start + batch_size]
            canvases, sr_ins = zip(*[self._prep_host(x) for x in chunk])
            bsz = len(chunk)
            pad = batch_size - bsz
            oc = np.stack(list(canvases) + [np.zeros_like(canvases[0])] * pad)
            si = np.stack(list(sr_ins) + [np.zeros_like(sr_ins[0])] * pad)
            det, _ = self._batch_fn(self.params, jnp.asarray(oc), jnp.asarray(si))
            det = jax.device_get(det)
            for i in range(bsz):
                gt = gts[start + i]
                t_raw, c_raw = detections_to_string_conf(
                    det["boxes"][i], det["classes"][i], det["scores"][i],
                    det["valid"][i], self.names
                )
                j = batch_size + i
                t_sr, c_sr = detections_to_string_conf(
                    det["boxes"][j], det["classes"][j], det["scores"][j],
                    det["valid"][j], self.names
                )
                acc_r += int(t_raw == gt)
                acc_s += int(t_sr == gt)
                cer_r += cer(gt, t_raw)
                cer_s += cer(gt, t_sr)
                per_image.append({"gt": gt, "raw": t_raw, "sr": t_sr,
                                  "raw_conf": c_raw, "sr_conf": c_sr,
                                  "index": start + i})
        return EvalReport(
            n=n, acc_raw=acc_r / max(n, 1), acc_sr=acc_s / max(n, 1),
            cer_raw=cer_r / max(n, 1), cer_sr=cer_s / max(n, 1),
            per_image=per_image,
        )

    def evaluate_folder(self, folder: str, batch_size: int = 64) -> EvalReport:
        """Reference protocol: every image in the folder, GT from filename
        stem uppercased (eval.py:23-25,94-99)."""
        from PIL import Image

        files = sorted(
            f for f in os.listdir(folder)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        images, gts = [], []
        for f in files:
            img = Image.open(os.path.join(folder, f)).convert("RGB")
            images.append(np.asarray(img, np.uint8))
            gts.append(os.path.splitext(f)[0].upper())
        return self.evaluate_arrays(images, gts, batch_size)
