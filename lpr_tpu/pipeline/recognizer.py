"""Fused end-to-end plate recognition pipeline.

Reference pipeline (``inference/run.py:153-277``): per frame, sequentially on
the host — plate detect -> top-3 by area -> crop -> OpenCV Hough deskew ->
2-row->1-row reshape -> OCR on original -> PIL resize -> LPSR -> restack ->
OCR on SR — with a device<->host round trip at every arrow and batch size 1.

TPU re-design: ONE jitted program over a batch of frames.  Detection, NMS,
top-K plate selection, oriented crop/deskew (gradient-based angle estimate
fused into the crop gather), row reshaping (sub-box sampling), LPSR, both OCR
passes and char NMS all run on device; only the final tiny (boxes, classes,
valid) arrays land on the host for string assembly.

Geometry notes
--------------
- Plate detect input is aspect-preserving letterbox with black fill —
  the device analogue of reference ``ResizeImg`` (detection.py:73-93).
- 2-row -> 1-row: instead of hconcat of image halves (run.py:40-52), the
  top/bottom halves of the *rotated box* are sampled straight into the left/
  right halves of the 192x32 SR input.
- OCR-on-original input: square canvas sampled around the rotated box with
  outside-box masking == crop + deskew + ResizeImg-pad (black).
- OCR-on-SR input: the 1-channel SR output is broadcast to RGB (the
  reference's RGB2BGR on 1 channel throws — SURVEY.md §2.1 quirk; we do the
  intended thing), restacked to 2 rows when the plate was squarish.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.models.lpsr import LPSRConfig, lpsr_apply
from lpr_tpu.models.yolo import YoloModel
from lpr_tpu.ops import image as im
from lpr_tpu.ops.boxes import clip_boxes
from lpr_tpu.ops.nms import nms_batched, nms_from_raw
from lpr_tpu.pipeline.chars import detections_to_string

# Plate-detector class names (reference yolo_classes/detect_class_names.txt).
DETECT_CLASSES = (
    "motorbike", "car", "bus", "truck", "fire truck", "ambulance",
    "police car", "square license plate", "rectangle license plate",
    "tuktuk", "bike",
)
PLATE_CLASS_IDS = (7, 8)  # square / rectangle license plate


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    det_hw: Tuple[int, int] = (1280, 1280)   # reference run.py:108
    ocr_hw: Tuple[int, int] = (128, 128)     # run.py:109
    sr_hw: Tuple[int, int] = (32, 192)       # run.py:80-96
    det_conf: float = 0.7                    # run.py:110
    ocr_conf: float = 0.25                   # run.py:111
    iou: float = 0.3                         # run.py:112
    max_plates: int = 3                      # run.py:180
    max_chars: int = 16
    # Char-NMS candidate pool.  Busy clean canvases (two-row, 9 chars)
    # produce <=46 multi-label candidates above conf 0.25 (measured on
    # char.pt), so 64 keeps full recall while halving the (K, K) IoU and
    # the blocked-greedy depth vs the previous 128.
    char_pre_topk: int = 64
    long_aspect: float = 1.5                 # run.py:22
    deskew: bool = True
    dtype: Any = jnp.bfloat16
    # MXU interp-matmul crop geometry (6x faster than gathers on TPU);
    # False falls back to the gather-based reference-exact sampler.
    fast_geometry: bool = True
    tile_hw: Tuple[int, int] = (64, 256)
    # Reference parity runs OCR on BOTH the raw crop and the SR output
    # (run.py:197,207).  False = SR-only OCR: halves the char-model work for
    # throughput serving where only the enhanced reading matters.
    ocr_on_original: bool = True
    # Run the plate detector's first three layers (S2D stem, stride-2
    # downsample, first C3) through the fused Pallas front-end kernel
    # (ops/pallas/yolo_front.py) — the high-res small-channel layers XLA
    # runs worst (22 -> 15 ms/step at batch 32).  Auto-disabled unless the
    # layer pattern matches, det_hw is (736, 1280), dtype is bf16 and the
    # backend is TPU.
    fused_front: bool = True
    # Extend the fused path through layers 3-4 (ops/pallas/yolo_mid.py).
    # Off by default: measured a net e2e LOSS at the bench geometry (the
    # kernel wins nothing once channels reach 128 — XLA runs layers 3-4 in
    # ~6.9 ms vs ~9.1 ms kernel + 6.4 ms repack at batch 32; see BENCHLOG
    # "negative results").  Kept as an option for future geometries where
    # the repack could fold into the front kernel's output stage.
    fused_mid: bool = False
    # int8-quantize the plate detector's conv stack (models.yolo.quantize_yolo:
    # dynamic per-tensor activation quant, per-channel int8 weights, BN
    # folded; Detect head stays float).  The int8 MXU path is 2x the bf16
    # peak on v5e; detection parity is within quant noise (see tests).
    int8_detector: bool = False
    # Freeze the weights into the compiled program as constants (the serving
    # "frozen graph" pattern).  XLA then specializes weight layouts at
    # compile time instead of re-laying them out every step — measured
    # 367 -> 551 fps/chip on the full pipeline (v5e, batch 32).  Costs a
    # recompile per weight swap; turn off for weight-hotswap serving.
    freeze_params: bool = True
    # Lazy-decode NMS (ops/nms.py:nms_from_raw): candidate selection runs
    # on the raw Detect logits and the grid/anchor decode is applied only
    # to the selected pre_topk candidates, skipping the full-grid
    # sigmoid/decode/concat (~2 ms/step at bench geometry).  Bit-identical
    # boxes/scores; see nms_from_raw's note on the sub-2px degenerate-box
    # gate ordering.
    lazy_decode: bool = True
    # Host-packed detector input: the step takes an extra uint8
    # (B, 64, RP*CP) quarter-grid tensor (pack_front_frames_host) and the
    # fused front consumes it directly with 1/255 folded into the stem
    # weights, skipping the on-device letterbox + pack transpose (~5.7
    # ms/step of pure layout work at bench geometry; the reference also
    # letterboxes on the host, my_models/detection.py:73-93).  Crops still
    # come from the raw frames.  Requires the fused front (TPU + matching
    # layers); :meth:`PlateRecognizer.recognize` packs automatically.
    packed_input: bool = False


def _aspect_canvas(img: jax.Array, canvas_hw: Tuple[int, int],
                   src_hw: Tuple[int, int]) -> jax.Array:
    """Place ``img`` (static src_hw) into a canvas, aspect-preserving,
    centered, black pad — static-shape ResizeImg."""
    ch, cw = canvas_hw
    sh, sw = src_hw
    scale = min(ch / sh, cw / sw)
    nh, nw = int(round(sh * scale)), int(round(sw * scale))
    resized = im.resize_bilinear(img, (nh, nw))
    canvas = jnp.zeros((ch, cw, img.shape[-1]), img.dtype)
    return jax.lax.dynamic_update_slice(
        canvas, resized, ((ch - nh) // 2, (cw - nw) // 2, 0)
    )


class PlateRecognizer:
    """Batched detect -> enhance -> recognize, one jit.

    Construct with built models + params; call :meth:`recognize` with a
    uint8 frame batch.
    """

    def __init__(
        self,
        plate_model: YoloModel,
        plate_params,
        char_model: YoloModel,
        char_params,
        lpsr_params,
        lpsr_cfg: LPSRConfig = LPSRConfig(),
        cfg: PipelineConfig = PipelineConfig(),
        plate_class_ids: Sequence[int] = PLATE_CLASS_IDS,
        char_names: Optional[Sequence[str]] = None,
        mesh=None,
    ):
        """``mesh``: optional 1-D jax.sharding.Mesh — shards the frame batch
        over the 'data' axis (multi-chip serving; params replicated)."""
        self.plate_model = plate_model
        self.char_model = char_model
        self.cfg = cfg
        self.lpsr_cfg = lpsr_cfg
        self.char_names = char_names
        self.mesh = mesh
        mask = np.zeros((plate_model.nc,), bool)
        mask[list(plate_class_ids)] = True
        self.plate_mask = jnp.asarray(mask)
        self.plate_class_ids = tuple(int(i) for i in plate_class_ids)
        self._front = None
        self._mid = None
        if (cfg.fused_front and cfg.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"):
            from lpr_tpu.ops.pallas.yolo_front import (front_geom,
                                                       front_pack_from_params)

            try:
                front_geom(*cfg.det_hw)   # validates the geometry
                self._front = front_pack_from_params(
                    plate_model, plate_params,
                    input_scale=1.0 / 255.0 if cfg.packed_input else 1.0)
            except ValueError:
                self._front = None        # geometry unsupported -> XLA path
            if self._front is not None and cfg.fused_mid:
                from lpr_tpu.ops.pallas.yolo_mid import (mid_geom,
                                                         mid_pack_from_params)

                try:
                    mid_geom(cfg.det_hw[0] // 4, cfg.det_hw[1] // 4)
                    self._mid = mid_pack_from_params(plate_model,
                                                     plate_params)
                except ValueError:
                    self._mid = None
        if cfg.packed_input and self._front is None:
            raise ValueError(
                "PipelineConfig.packed_input requires the fused front "
                "kernel (TPU backend, bf16, matching layer pattern and "
                "geometry)")
        if cfg.int8_detector:
            from lpr_tpu.models.yolo import quantize_yolo

            plate_params = quantize_yolo(plate_model, plate_params)
        self._params = {
            "plate": plate_params,
            "char": char_params,
            "lpsr": lpsr_params,
        }
        step = self._step_fn = self._build_step()
        self._batch_sharding = None
        if mesh is not None:
            from lpr_tpu.parallel.mesh import batch_sharding, replicate, replicated

            self._params = replicate(self._params, mesh)
            self._batch_sharding = bs = batch_sharding(mesh)
            data_in = (bs, bs) if cfg.packed_input else (bs,)
            self._step = jax.jit(step,
                                 in_shardings=(replicated(mesh),) + data_in)
        else:
            self._step = jax.jit(step)
        self._rebuild_frozen()

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        """Reassigning params rebuilds the frozen-weights program, so weight
        hot-swap works with ``cfg.freeze_params`` (the default)."""
        self._params = value
        self._rebuild_frozen()

    def _rebuild_frozen(self):
        if not self.cfg.freeze_params:
            self.step_frozen = None
            self._step_frozen = None
            return
        params, step = self._params, self._step_fn
        # plain closure (for embedding in outer jits, e.g. the bench scan)
        # + its jitted form for direct calls
        if self.cfg.packed_input:
            self.step_frozen = lambda frames, packed: step(params, frames,
                                                           packed)
        else:
            self.step_frozen = lambda frames: step(params, frames)
        if self._batch_sharding is not None:
            nargs = 2 if self.cfg.packed_input else 1
            self._step_frozen = jax.jit(
                self.step_frozen,
                in_shardings=(self._batch_sharding,) * nargs)
        else:
            self._step_frozen = jax.jit(self.step_frozen)

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        lpsr_cfg = self.lpsr_cfg

        from lpr_tpu.ops.resample import crop_rotated_fast, plate_tile

        def per_plate(frame, box, angle_on):
            """Device-side geometry for one plate of one frame."""
            w = box[2] - box[0]
            h = jnp.maximum(box[3] - box[1], 1.0)
            sh, sw = cfg.sr_hw
            if cfg.fast_geometry:
                tile, geom = plate_tile(frame, box, cfg.tile_hw)

                def crop(angle, out_hw, **kw):
                    return crop_rotated_fast(frame, box, angle, out_hw,
                                             tile=tile, tile_geom=geom, **kw)
            else:
                def crop(angle, out_hw, **kw):
                    return im.crop_rotated(frame, box, angle, out_hw, **kw)

            # skew estimate on a coarse gray crop
            coarse = crop(jnp.float32(0.0), (32, 96))
            gray = im.rgb_to_gray(coarse.astype(jnp.float32))
            aspect = (w / 96.0) / (h / 32.0)
            angle = im.estimate_skew_angle(
                gray, max_abs_deg=15.0, pixel_aspect=aspect
            ) * angle_on
            is_long = (w / h) > cfg.long_aspect
            # 1-row long image for SR input
            full = crop(angle, (sh, sw))
            top = crop(angle, (sh, sw // 2), v_range=(-0.5, 0.0))
            bot = crop(angle, (sh, sw // 2), v_range=(0.0, 0.5))
            two_row = jnp.concatenate([top, bot], axis=1)
            long_img = jnp.where(is_long, full, two_row)
            # OCR canvas from the original frame (straightened, aspect-pad)
            ocr_orig = crop(angle, cfg.ocr_hw, square=True, mask_outside=True)
            return long_img, ocr_orig, is_long

        def sr_to_ocr_canvas(sr_long, is_long):
            """SR output (sh, sw, 1) -> (ocr_h, ocr_w, 3) canvas."""
            sh, sw = cfg.sr_hw
            rgb = jnp.repeat(sr_long, 3, axis=-1)
            restacked = jnp.concatenate(
                [rgb[:, : sw // 2, :], rgb[:, sw // 2 :, :]], axis=0
            )  # (2*sh, sw//2, 3)
            canv_sq = _aspect_canvas(restacked, cfg.ocr_hw, (2 * sh, sw // 2))
            canv_long = _aspect_canvas(rgb, cfg.ocr_hw, (sh, sw))
            return jnp.where(is_long, canv_long, canv_sq)

        def _step_impl(params, frames, packed):
            B = frames.shape[0]
            P = cfg.max_plates
            x = frames.astype(cfg.dtype) / 255.0
            fh, fw = x.shape[1], x.shape[2]
            decode = not cfg.lazy_decode
            if packed is not None:
                # host-packed detector input: letterbox geometry only
                # (the resize/pad happened on the host, inside the pack)
                gain_f, _, (pad_l, pad_t) = im.letterbox_geom(
                    fh, fw, cfg.det_hw)
                gain = jnp.float32(gain_f)
                pad = jnp.asarray([pad_l, pad_t], jnp.float32)
                out = self.plate_model.apply(
                    params["plate"], None, front=self._front,
                    mid=self._mid, packed_frames=packed,
                    packed_hw=cfg.det_hw, decode=decode)
            else:
                lb, gain, pad = im.letterbox(x, cfg.det_hw, fill=0.0)
                out = self.plate_model.apply(params["plate"], lb,
                                             front=self._front,
                                             mid=self._mid, decode=decode)
            nms_kw = dict(max_det=16, pre_topk=64, multi_label=True,
                          agnostic=True, class_ids=self.plate_class_ids)
            if cfg.lazy_decode:
                det = nms_from_raw(out, self.plate_model.strides,
                                   self.plate_model.anchors,
                                   cfg.det_conf, cfg.iou, **nms_kw)
            else:
                det = nms_batched(out[0], cfg.det_conf, cfg.iou, **nms_kw)
            # letterbox -> original frame coords
            boxes = (det["boxes"] - jnp.concatenate([pad, pad])) / gain
            boxes = clip_boxes(boxes, fh, fw)
            areas = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
            areas = jnp.where(det["valid"], areas, -1.0)
            top_areas, top_idx = jax.lax.top_k(areas, P)  # (B, P)
            plate_valid = top_areas > 0
            sel_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
            sel_scores = jnp.take_along_axis(det["scores"], top_idx, axis=1)
            sel_classes = jnp.take_along_axis(det["classes"], top_idx, axis=1)

            angle_on = jnp.float32(1.0 if cfg.deskew else 0.0)
            pp = jax.vmap(  # over plates within a frame
                lambda frame, box: per_plate(frame, box, angle_on),
                in_axes=(None, 0),
            )
            long_img, ocr_orig, is_long = jax.vmap(pp)(x, sel_boxes)
            # (B, P, sh, sw, 3), (B, P, oh, ow, 3), (B, P)
            sh, sw = cfg.sr_hw
            oh, ow = cfg.ocr_hw
            sr_in = long_img.reshape(B * P, sh, sw, 3)
            sr_out = lpsr_apply(params["lpsr"], sr_in, lpsr_cfg)
            sr_out = sr_out.astype(jnp.float32)
            ocr_sr = jax.vmap(sr_to_ocr_canvas)(
                sr_out, is_long.reshape(B * P, 1, 1, 1)
            )
            if cfg.ocr_on_original:
                ocr_in = jnp.concatenate(
                    [ocr_orig.reshape(B * P, oh, ow, 3), ocr_sr], axis=0
                )  # (2*B*P, oh, ow, 3)
            else:
                ocr_in = ocr_sr
            cout = self.char_model.apply(params["char"],
                                         ocr_in.astype(cfg.dtype),
                                         decode=decode)  # sr canvas is f32
            cnms_kw = dict(max_det=cfg.max_chars, pre_topk=cfg.char_pre_topk,
                           multi_label=True, agnostic=True)
            if cfg.lazy_decode:
                cdet = nms_from_raw(cout, self.char_model.strides,
                                    self.char_model.anchors,
                                    cfg.ocr_conf, cfg.iou, **cnms_kw)
            else:
                cdet = nms_batched(cout[0], cfg.ocr_conf, cfg.iou, **cnms_kw)
            return {
                "plate_boxes": sel_boxes,
                "plate_scores": sel_scores,
                "plate_classes": sel_classes,
                "plate_valid": plate_valid,
                "is_long": is_long,
                "sr": sr_out.reshape(B, P, sh, sw, 1),
                "chars_orig": jax.tree.map(
                    lambda a: a[: B * P].reshape(B, P, *a.shape[1:]), cdet
                ) if cfg.ocr_on_original else None,
                "chars_sr": jax.tree.map(
                    lambda a: a[B * P if cfg.ocr_on_original else 0 :].reshape(
                        B, P, *a.shape[1:]), cdet
                ),
            }

        if cfg.packed_input:
            def step(params, frames, packed):
                return _step_impl(params, frames, packed)
        else:
            def step(params, frames):
                return _step_impl(params, frames, None)
        return step

    # ------------------------------------------------------------------
    def recognize(self, frames: np.ndarray) -> List[List[Dict[str, Any]]]:
        """frames: (B, H, W, 3) uint8 RGB.  Returns per-frame lists of plate
        dicts with original-OCR and SR-OCR strings.  In ``packed_input``
        mode the quarter-grid pack runs here on the host."""
        return self.assemble(jax.device_get(self.step_raw(jnp.asarray(frames))))

    def assemble(self, out: Dict[str, Any]) -> List[List[Dict[str, Any]]]:
        """Host post-processing of a fetched :meth:`step_raw` output tree
        (split out so a serving loop can overlap the next batch's dispatch
        with this batch's result assembly)."""
        results: List[List[Dict[str, Any]]] = []
        names = self.char_names
        B, P = out["plate_valid"].shape
        for b in range(B):
            plates = []
            for p in range(P):
                if not out["plate_valid"][b, p]:
                    continue
                co = out["chars_orig"]
                cs = out["chars_sr"]
                kw = {} if names is None else {"names": names}
                plates.append({
                    "box": out["plate_boxes"][b, p].tolist(),
                    "score": float(out["plate_scores"][b, p]),
                    "class_id": int(out["plate_classes"][b, p]),
                    "is_long": bool(out["is_long"][b, p]),
                    "text": detections_to_string(
                        co["boxes"][b, p], co["classes"][b, p],
                        co["valid"][b, p], **kw) if co is not None else "",
                    "text_sr": detections_to_string(
                        cs["boxes"][b, p], cs["classes"][b, p],
                        cs["valid"][b, p], **kw),
                    # "sr" may have been pruned from the fetched tree by a
                    # serving loop that doesn't return SR crop images
                    # (ServeConfig.return_sr=False)
                    "sr": out["sr"][b, p] if "sr" in out else None,
                })
            results.append(plates)
        return results

    def step_raw(self, frames, packed=None) -> Dict[str, Any]:
        """Jitted device step only (for benchmarking / serving).  Uses the
        frozen-weights program when ``cfg.freeze_params`` (default).

        In ``packed_input`` mode, ``packed`` is the host-packed uint8
        quarter-grid tensor (``pack_front_frames_host``); when omitted it
        is computed here from ``frames``."""
        if self.cfg.packed_input:
            if packed is None:
                from lpr_tpu import native
                from lpr_tpu.ops.pallas.yolo_front import \
                    pack_front_frames_host

                fr = np.asarray(frames)
                pk = native.pack_front_batch(fr, self.cfg.det_hw)
                if pk is None:  # no native toolchain -> numpy packer
                    pk = pack_front_frames_host(fr, self.cfg.det_hw)
                packed = jnp.asarray(pk)
            if self._step_frozen is not None:
                return self._step_frozen(frames, packed)
            return self._step(self.params, frames, packed)
        if self._step_frozen is not None:
            return self._step_frozen(frames)
        return self._step(self.params, frames)
