"""SR-improvement case finder — counterpart of reference
``evaluation/find_improvement.py``.

Runs the two-path eval over a folder, then selects "convincing improvement"
cases where the raw OCR was low-confidence/wrong and the SR OCR is correct
with high confidence (reference gates: orig conf < 0.45 and SR OCR correct
with conf >= 0.7, find_improvement.py:237-240), optionally applying CLAHE
gray preprocessing to the raw path (:43-67), and renders a 3-column report
panel per case (:90-167).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def clahe_gray(img_u8: np.ndarray, clip: float = 2.0, tiles: int = 8):
    """CLAHE on grayscale (reference :43-67); cv2 when available, with an
    identity fallback."""
    try:
        import cv2

        g = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
        cl = cv2.createCLAHE(clipLimit=clip, tileGridSize=(tiles, tiles))
        out = cl.apply(g)
        return np.stack([out] * 3, -1)
    except Exception:
        return img_u8


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Find convincing SR improvements")
    p.add_argument("--eval-folder", required=True)
    p.add_argument("--sr-weights", required=True)
    p.add_argument("--ocr-weights", required=True)
    p.add_argument("--out", default="improvements")
    p.add_argument("--ocr-conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.3)
    p.add_argument("--low-conf", type=float, default=0.45)
    p.add_argument("--high-conf", type=float, default=0.7)
    p.add_argument("--clahe", action="store_true")
    return p.parse_args(argv)


def render_panel(lr_img, sr_img, gt, raw, raw_conf, sr_text, sr_conf):
    """3-row report card: GT header, LR + raw OCR, SR + SR OCR."""
    from PIL import Image, ImageDraw, ImageFont

    W = 420
    font_p = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf"
    try:
        font = ImageFont.truetype(font_p, 16)
    except Exception:
        font = ImageFont.load_default()
    panel = Image.new("RGB", (W, 260), (40, 40, 40))
    d = ImageDraw.Draw(panel)
    d.text((10, 8), f"Ground Truth: {gt}", fill=(120, 180, 255), font=font)

    def paste(img, y):
        img = Image.fromarray(img).resize((W - 40, 50))
        panel.paste(img, (20, y))

    paste(lr_img, 40)
    ok_raw = raw == gt
    d.text((10, 96), f"OCR: {raw or '-'} (conf {raw_conf:.2f})",
           fill=(120, 255, 120) if ok_raw else (255, 100, 100), font=font)
    paste(sr_img, 130)
    ok_sr = sr_text == gt
    d.text((10, 186), f"SR OCR: {sr_text or '-'} (conf {sr_conf:.2f})",
           fill=(120, 255, 120) if ok_sr else (255, 100, 100), font=font)
    return np.asarray(panel)


def main(argv=None):
    args = parse_args(argv)
    from PIL import Image

    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.lpsr import load_lpsr
    from lpr_tpu.models.yolo import load_char_ocr

    model, params, ck = load_char_ocr(args.ocr_weights)
    lpsr = load_lpsr(args.sr_weights)
    ev = OcrEvaluator(model, params, lpsr, names=ck.names,
                      ocr_conf=args.ocr_conf, iou=args.iou)

    files = sorted(
        f for f in os.listdir(args.eval_folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    images, gts = [], []
    for f in files:
        img = np.asarray(
            Image.open(os.path.join(args.eval_folder, f)).convert("RGB")
        )
        images.append(clahe_gray(img) if args.clahe else img)
        gts.append(os.path.splitext(f)[0].upper())
    rep = ev.evaluate_arrays(images, gts)

    os.makedirs(args.out, exist_ok=True)
    n_found = 0
    for r in rep.per_image:
        improved = (r["raw_conf"] < args.low_conf and r["sr"] == r["gt"]
                    and r["sr_conf"] >= args.high_conf)
        if not improved:
            continue
        i = r["index"]
        # re-run SR for the panel image
        canvas, sr_in = ev._prep_host(images[i])
        import jax.numpy as jnp

        det, sr = ev._batch_fn(
            ev.params, jnp.asarray(canvas[None]), jnp.asarray(sr_in[None])
        )
        sr_img = (np.clip(np.repeat(np.asarray(sr)[0], 3, -1), 0, 1) * 255
                  ).astype(np.uint8)
        panel = render_panel(images[i], sr_img, r["gt"], r["raw"],
                             r["raw_conf"], r["sr"], r["sr_conf"])
        Image.fromarray(panel).save(
            os.path.join(args.out, f"improved_{r['gt']}.png")
        )
        n_found += 1
        print(f"improved: {r['gt']} raw={r['raw']!r}({r['raw_conf']:.2f}) "
              f"sr={r['sr']!r}({r['sr_conf']:.2f})")
    print(f"{n_found} convincing improvements -> {args.out}")


if __name__ == "__main__":
    main()
