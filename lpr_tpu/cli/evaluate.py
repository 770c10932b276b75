"""Accuracy evaluation CLI — counterpart of reference ``evaluation/eval.py``.

Folder of plate crops, GT = filename stem uppercased; reports full-plate
accuracy and CER with and without SR (the published headline protocol,
README.md:240-245; OCR conf default 0.5 per the README, 0.45 was used by
scripts/eval_sr.sh).
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SR-for-OCR evaluation (TPU)")
    p.add_argument("--eval-folder", required=True)
    p.add_argument("--sr-weights", required=True)
    p.add_argument("--ocr-weights", required=True)
    p.add_argument("--ocr-conf", type=float, default=0.5)
    p.add_argument("--iou", type=float, default=0.3)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--json-out", type=str, default=None)
    p.add_argument("--per-image", action="store_true",
                   help="include per-image gt/raw/sr strings in --json-out "
                        "(the error-distribution analyses need them)")
    p.add_argument("--verbose", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.lpsr import load_lpsr
    from lpr_tpu.models.yolo import load_char_ocr

    model, params, ck = load_char_ocr(args.ocr_weights)
    lpsr = load_lpsr(args.sr_weights)
    ev = OcrEvaluator(model, params, lpsr, names=ck.names,
                      ocr_conf=args.ocr_conf, iou=args.iou)
    rep = ev.evaluate_folder(args.eval_folder, batch_size=args.batch)
    if args.verbose:
        for r in rep.per_image:
            print(f"GT {r['gt']:<12} raw {r['raw']:<12} sr {r['sr']}")
    print("--- SR Model Evaluation Report ---")
    print(f"Total images evaluated: {rep.n}")
    print(f"Without SR: accuracy {rep.acc_raw*100:.2f}%  CER {rep.cer_raw*100:.2f}%")
    print(f"With SR:    accuracy {rep.acc_sr*100:.2f}%  CER {rep.cer_sr*100:.2f}%")
    print(f"Improvement: {(rep.acc_sr-rep.acc_raw)*100:+.2f} pts accuracy, "
          f"{(rep.cer_sr-rep.cer_raw)*100:+.2f} pts CER")
    if args.json_out:
        with open(args.json_out, "w") as f:
            out = {
                "n": rep.n, "acc_raw": rep.acc_raw, "acc_sr": rep.acc_sr,
                "cer_raw": rep.cer_raw, "cer_sr": rep.cer_sr,
            }
            if args.per_image:
                out["per_image"] = rep.per_image
            json.dump(out, f)


if __name__ == "__main__":
    main()
