"""Production-geometry detector validation: rect 736x1280, nc=11.

The reference serves its plate detector at exactly this shape
(``/root/reference/onnx_models/detection/config.pbtxt:8-19``: input
``images [3, 736, 1280]``, nc=11) but its vendored trainer cannot even
validate (missing ``val.py``).  This tool closes VERDICT r3 item #6's
validation half: it runs a trained checkpoint through the real val path
(letterbox -> detector -> NMS -> 101-pt AP) at the serving geometry, where
the prediction lattice is (92*160 + 46*80 + 23*40) * 3 = 57,960 anchors —
the "58K-anchor scale" the loss/val stack had never been exercised at.

Usage (TPU or CPU):
  python tools/val_det_rect.py --img-dir /tmp/det_rect/val/images \
      --label-dir /tmp/det_rect/val/labels \
      --weights /tmp/det640_ckpt2/best.npz
"""

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-dir", required=True)
    p.add_argument("--label-dir", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--arch", default="yolov5s")
    p.add_argument("--nc", type=int, default=11)
    p.add_argument("--imgsz", type=int, default=1280,
                   help="long side; rect bucket height derives from the "
                        "val set's aspect ratio (736 for 0.575 frames)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--bf16", action="store_true",
                   help="validate in bfloat16 (the serving dtype)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lpr_tpu.data.yolo_data import YoloValDataset
    from lpr_tpu.models.yolo import build_yolo, yolov5_spec, _SIZE_PRESETS
    from lpr_tpu.train.yolo import validate_map
    from lpr_tpu.weights.checkpoint import load_params

    size = args.arch.replace("yolov5", "") or "s"
    depth, width = _SIZE_PRESETS[size]
    model = build_yolo(yolov5_spec(nc=args.nc, depth=depth, width=width),
                       strides=(8, 16, 32))
    params = load_params(args.weights, model.init(jax.random.PRNGKey(0)))

    # pad=0.0 hits the serving shape exactly (the default 0.5 stride-pad
    # would round 736 up to 768, like the reference val's rect pad)
    ds = YoloValDataset(args.img_dir, args.label_dir, imgsz=args.imgsz,
                        pad=0.0)
    bucket, shapes = ds._bucket_shapes()
    lattice = {
        k: sum((h // s) * (w // s) * 3 for s in (8, 16, 32))
        for k, (h, w) in shapes.items()
    }
    print(f"val {len(ds)} images; shape palette "
          f"{ {k: v for k, v in shapes.items()} } "
          f"-> anchors/image { lattice }")

    t0 = time.perf_counter()
    metrics = validate_map(
        model, params, ds.batches(args.batch_size, rect=True),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    dt = time.perf_counter() - t0
    print(f"geometry={list(shapes.values())} n={len(ds)} "
          f"wall={dt:.1f}s ({len(ds) / dt:.1f} img/s incl. compile)")
    import numpy as np

    vals = {k: float(np.mean(metrics[k]))
            for k in ("precision", "recall", "map50", "map")}
    for k, v in vals.items():
        print(f"  {k:10s} {v:.4f}")
    fitness = 0.1 * vals["map50"] + 0.9 * vals["map"]
    print(f"  {'fitness':10s} {fitness:.4f}")


if __name__ == "__main__":
    main()
