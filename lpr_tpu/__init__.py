"""lpr_tpu — TPU-native license-plate detection / enhancement / recognition.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `License-Plate-Detection-and-Recognition-with-Image-Enhancement`
pipeline (YOLOv5-family plate detector, LPSR super-resolution enhancer,
char-level YOLO OCR), redesigned TPU-first:

- NHWC tensors, HWIO conv weights, bf16-capable compute on the MXU.
- Everything under ``jit``: static shapes, padded/masked NMS, device-side
  crop/warp, fused decode.
- Data parallelism via ``jax.sharding.Mesh`` + ``NamedSharding`` (the
  reference's DDP equivalent; see SURVEY.md §2.8).

Subpackages
-----------
``lpr_tpu.models``   LPSR, YOLO family (declarative spec -> graph), CycleGAN
``lpr_tpu.ops``      conv blocks, resize/letterbox, boxes, NMS, pallas kernels
``lpr_tpu.weights``  safe (non-executing) PyTorch checkpoint import + layout
                     conversion (OIHW -> HWIO)
``lpr_tpu.pipeline`` fused detect -> crop -> enhance -> OCR orchestrator
``lpr_tpu.parallel`` mesh / sharding helpers
``lpr_tpu.train``    LPSR / CycleGAN / YOLO trainers
``lpr_tpu.data``     degradation synthesis, datasets, image pool
``lpr_tpu.eval``     plate-accuracy + CER harness
``lpr_tpu.serve``    batched dispatch loop (Triton replacement)
"""

__version__ = "0.1.0"

REFERENCE = "nhanth301/License-Plate-Detection-and-Recognition-with-Image-Enhancement"
