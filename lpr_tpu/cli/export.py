"""Model export CLI — counterpart of reference ``my_utils/export_onnx.py``.

The reference exports its three models to ONNX for Triton serving
(export_onnx.py:38-99: sr/detection/ocr, opset 16, dynamic axes).  This CLI
unifies every export surface the TPU framework supports:

- ``--format onnx``: dependency-free ONNX emit with the reference's exact
  serving contract — sr (input_image/output_image, dynamic batch/H/W) and
  detection/ocr (input_image/predictions, decode baked in, NMS excluded,
  dynamic batch) — see :mod:`lpr_tpu.weights.onnx_export`.
- ``--format stablehlo``: the TPU-native portable artifact for any of the
  three model types (jax.export bytes; see weights/export_stablehlo.py).
- ``--format torch``     (sr only): reference-loadable .pth state dict.
- ``--format npz``: native checkpoint.

Weights may be torch (.pt/.pth), ONNX (.onnx) or native (.npz) — whatever
:func:`load_lpsr` / :func:`load_yolo_torch` accept.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export models (TPU framework)")
    p.add_argument("--model-type", required=True,
                   choices=["sr", "detection", "ocr"])
    p.add_argument("--weights", required=True,
                   help=".pth/.pt/.onnx/.npz input weights")
    p.add_argument("--output", required=True, help="output artifact path")
    p.add_argument("--format", default=None,
                   choices=["onnx", "stablehlo", "torch", "npz"],
                   help="default: from the output extension")
    p.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="example input size for stablehlo tracing "
                   "(defaults: sr 32x192, detection 1280x1280, ocr 128x128)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    fmt = args.format
    if fmt is None:
        ext = os.path.splitext(args.output)[1].lower()
        fmt = {".onnx": "onnx", ".pth": "torch", ".pt": "torch",
               ".npz": "npz"}.get(ext, "stablehlo")
    out_dir = os.path.dirname(os.path.abspath(args.output))
    os.makedirs(out_dir, exist_ok=True)

    if args.model_type == "sr":
        from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr

        cfg = LPSRConfig()
        params = load_lpsr(args.weights, cfg)
        if fmt == "onnx":
            from lpr_tpu.weights.onnx_export import export_lpsr_onnx

            export_lpsr_onnx(params, args.output, cfg)
        elif fmt == "torch":
            from lpr_tpu.weights.export_torch import save_lpsr_torch

            save_lpsr_torch(args.output, params, cfg)
        elif fmt == "npz":
            from lpr_tpu.weights.checkpoint import save_params

            save_params(args.output, params)
        else:
            from lpr_tpu.weights.export_stablehlo import export_lpsr

            h, w = args.size or (32, 192)
            export_lpsr(params, args.output, batch=1, hw=(h, w), cfg=cfg)
    else:  # detection / ocr — YOLO family
        from lpr_tpu.models.yolo import load_yolo_torch

        model, params, _ = load_yolo_torch(args.weights)
        if fmt == "onnx":
            from lpr_tpu.weights.onnx_export import export_yolo_onnx

            if args.size:
                h, w = args.size
            else:
                h, w = (1280, 1280) if args.model_type == "detection" \
                    else (128, 128)
            export_yolo_onnx(model, params, args.output, hw=(h, w))
            print(f"exported {args.model_type} (onnx) -> {args.output}")
            return
        if fmt == "torch":
            raise SystemExit("torch re-export covers the sr model only")
        if fmt == "npz":
            from lpr_tpu.weights.checkpoint import save_params

            save_params(args.output, params)
        else:
            from lpr_tpu.weights.export_stablehlo import export_detector

            if args.size:
                h, w = args.size
            else:
                h, w = (1280, 1280) if args.model_type == "detection" \
                    else (128, 128)
            export_detector(model, params, args.output, batch=1, hw=(h, w))
    print(f"exported {args.model_type} ({fmt}) -> {args.output}")


if __name__ == "__main__":
    main()
