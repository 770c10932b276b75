"""Train the char OCR detector from scratch on synthetic plate renders.

The reference ships its OCR model only as trained weights (weights/char.pt,
produced by an external YOLOv5 run — the vendored trainer cannot even run,
SURVEY.md §2.2).  This tool closes the last self-training gap: it trains the
exact char.pt architecture (``char_ocr_spec()`` — Focus/SPP/C3TR backbone,
single-scale stride-8 Detect, 2 AutoAnchor anchors; SURVEY.md §2.3) from
scratch with the repo's own YOLO trainer, so every model in the pipeline
(plate detector, LPSR, OCR) is reproducible by this framework alone.

Training data is generated through the framework's own surfaces, matching
what the OCR stage actually sees at eval/serving time:

- **raw path**: tight one-row renders (``make_eval_set.render_tight_plate``
  geometry, per-char ink boxes) degraded ON DEVICE through the classical
  degradation model + estimated real-blur kernels + contrast wash + glare
  (the r3c protocol regime, ``tools/make_eval_set.py``), letterboxed onto
  the 128x128 black canvas exactly like ``OcrEvaluator._prep_host``;
- **SR path**: the same LR crops run through the committed glare LPSR
  (``checkpoints/lpsr_synth_glare``) with the harness's uint8 round-trip —
  the model learns to read real enhancer output, not an approximation;
- **two-row squares** (host-rendered, generic degradation) for the live
  pipeline's square/restacked plates.

Anchors are derived from the label statistics with the repo's AutoAnchor
(k-means + GA, ``lpr_tpu/utils/autoanchor.py`` = reference
``yolov5/utils/autoanchor.py:65-165``) — the same route that produced
char.pt's evolved ``anchors: 2``.

Usage:
    python tools/train_char_ocr.py [--steps 6000] [--batch 64]
        [--out checkpoints/char_ocr_synth.npz] [--protocol-check]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf"
CLASSES = "0123456789abcdefghijklmnopqrstuvwxyz"
IMGSZ = 128
MAX_LABELS = 10
HR_HW = (64, 384)          # render_tight_plate canvas
LR_HW = (32, 192)          # degradation output (protocol crop size)
BAND_NH = 21               # int(round(32 * 128/192)): letterboxed band rows
BAND_TOP = (IMGSZ - BAND_NH) // 2


def _cls(ch: str) -> int:
    return CLASSES.index(ch.lower())


def _draw_row(d, font, text, x0, y0, fg):
    """Draw ``text`` at (x0, y0); return per-char ink boxes
    [(ch, x1, y1, x2, y2)] in canvas px.  "1" is drawn with the bar glyph
    "I" (VN plate topology, make_eval_set.render_tight_plate) but keeps its
    "1" label; "-"/"." are drawn unlabeled distractors."""
    disp = text.replace("1", "I")
    d.text((x0, y0), disp, fill=fg, font=font)
    boxes = []
    for i, (ch, g) in enumerate(zip(text, disp)):
        pre = font.getlength(disp[:i])  # kerning-correct prefix advance
        gl, gt, gr, gb = font.getbbox(g)
        if ch.isalnum():
            boxes.append((ch, x0 + pre + gl, y0 + gt, x0 + pre + gr, y0 + gb))
    return boxes


def render_band_with_boxes(text: str, nprng: np.random.RandomState):
    """One-row tight render, identical geometry to
    ``make_eval_set.render_tight_plate(style='plate')``, plus per-char
    boxes in the final (64, 384) HR frame."""
    h, w = HR_HW
    txt = text[:3] + "-" + text[3:6] + "." + text[6:]
    bg = tuple(int(v) for v in nprng.randint(195, 230, 3))
    fg = tuple(int(v) for v in nprng.randint(25, 65, 3))
    font = ImageFont.truetype(FONT, int(h * 0.82))
    probe = ImageDraw.Draw(Image.new("RGB", (8, 8)))
    tw = probe.textlength(txt.replace("1", "I"), font=font)
    tmp = Image.new("RGB", (int(tw) + 8, h), bg)
    d = ImageDraw.Draw(tmp)
    boxes = _draw_row(d, font, txt, 4, -h * 0.12, fg)
    sx = w / tmp.width
    img = np.asarray(tmp.resize((w, h), Image.BILINEAR), np.uint8)
    out = []
    for ch, x1, y1, x2, y2 in boxes:
        out.append((ch, x1 * sx, max(y1, 0.0), x2 * sx, min(y2, h - 1.0)))
    return img, out


def band_labels_on_canvas(boxes) -> np.ndarray:
    """HR-frame char boxes -> normalized (cls, xywh) on the 128^2 OCR canvas
    (the letterbox mapping is deterministic: x spans the full width, the
    band occupies rows BAND_TOP..BAND_TOP+21)."""
    h, w = HR_HW
    labels = []
    for ch, x1, y1, x2, y2 in boxes:
        xc, yc = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
        bw, bh = (x2 - x1) / w, (y2 - y1) / h
        labels.append([_cls(ch), xc,
                       (BAND_TOP + yc * BAND_NH) / IMGSZ,
                       bw * IMGSZ / IMGSZ,  # x fills the canvas width
                       bh * BAND_NH / IMGSZ])
    return np.asarray(labels, np.float32)


MONO_FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf"


def render_plate_with_boxes(text: str, rng: random.Random, two_row: bool,
                            font_path: str, bordered: bool):
    """Bordered/plain plate render in either the protocol face or the
    street-frame mono face (``synth_plates.render_plate`` domain — what the
    live pipeline's detector crops actually contain)."""
    bg = tuple(rng.randint(195, 230) for _ in range(3))
    fg = tuple(rng.randint(25, 65) for _ in range(3))
    if two_row:
        h0 = 128
        font = ImageFont.truetype(font_path, int(h0 * rng.uniform(0.34,
                                                                  0.42)))
        rows = [text[:3], text[3:]]
        probe = ImageDraw.Draw(Image.new("RGB", (8, 8)))
        w0 = int(max(probe.textlength(r.replace("1", "I"), font=font)
                     for r in rows)) + 16
        img = Image.new("RGB", (w0, h0), bg)
        d = ImageDraw.Draw(img)
        boxes = []
        for r, row in enumerate(rows):
            tw = font.getlength(row.replace("1", "I"))
            boxes += _draw_row(d, font, row, (w0 - tw) / 2,
                               h0 * (0.04 + 0.48 * r), fg)
    else:
        h0 = 64
        font = ImageFont.truetype(font_path, int(h0 * rng.uniform(0.58,
                                                                  0.72)))
        probe = ImageDraw.Draw(Image.new("RGB", (8, 8)))
        tw = probe.textlength(text.replace("1", "I"), font=font)
        w0 = int(tw) + rng.randint(10, 40)
        img = Image.new("RGB", (w0, h0), bg)
        d = ImageDraw.Draw(img)
        boxes = _draw_row(d, font, text, (w0 - tw) / 2, h0 * 0.1, fg)
    if bordered:
        ImageDraw.Draw(img).rectangle([1, 1, img.width - 2, img.height - 2],
                                      outline=(60, 60, 70), width=2)
    return np.asarray(img, np.uint8), boxes


def tworow_sample(rng: random.Random):
    """Host-composed + host-degraded pipeline-domain canvas and labels:
    bordered/plain plates, one- or two-row, protocol or mono face."""
    from synth_plates import random_plate_text

    two = rng.random() < 0.5
    text = random_plate_text(rng, two_row=two)
    img, boxes = render_plate_with_boxes(
        text, rng, two,
        MONO_FONT if rng.random() < 0.5 else FONT,
        bordered=rng.random() < 0.7)
    h0, w0 = img.shape[:2]
    s = min(IMGSZ / w0, IMGSZ / h0) * rng.uniform(0.72, 1.0)
    nw, nh = max(int(w0 * s), 8), max(int(h0 * s), 8)
    left = rng.randint(0, IMGSZ - nw)
    top = rng.randint(0, IMGSZ - nh)
    canvas = np.zeros((IMGSZ, IMGSZ, 3), np.uint8)
    canvas[top:top + nh, left:left + nw] = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    labels = []
    for ch, x1, y1, x2, y2 in boxes:
        bx1, by1 = x1 * nw / w0 + left, y1 * nh / h0 + top
        bx2, by2 = x2 * nw / w0 + left, y2 * nh / h0 + top
        if bx2 - bx1 < 2 or by2 - by1 < 2:
            continue
        labels.append([_cls(ch), (bx1 + bx2) / 2 / IMGSZ,
                       (by1 + by2) / 2 / IMGSZ,
                       (bx2 - bx1) / IMGSZ, (by2 - by1) / IMGSZ])
    pil = Image.fromarray(canvas)
    if rng.random() < 0.8:
        pil = pil.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.2)))
    if rng.random() < 0.5:
        f = rng.uniform(0.35, 0.8)
        small = pil.resize((max(int(IMGSZ * f), 8),) * 2, Image.BICUBIC)
        pil = small.resize((IMGSZ, IMGSZ), Image.BICUBIC)
    arr = np.asarray(pil, np.float32)
    arr += np.random.RandomState(rng.randint(0, 1 << 30)).normal(
        0, rng.uniform(0, 8), arr.shape)
    c = rng.uniform(0.65, 1.0)
    arr = c * arr + (1 - c) * rng.uniform(0.45, 0.8) * 255.0
    if rng.random() < 0.3:
        g = arr @ np.array([0.299, 0.587, 0.114], np.float32)
        arr = np.repeat(g[..., None], 3, -1)
    return np.clip(arr, 0, 255).astype(np.uint8), \
        np.asarray(labels, np.float32)


def build_pool(n: int, seed: int):
    """HR band renders + canvas labels, texts disjoint from eval seed 0."""
    from train_lpsr_synth import disjoint_texts

    texts = disjoint_texts(n, seed if seed != 0 else 1)
    nprng = np.random.RandomState(seed + 7)
    hrs = np.empty((n, *HR_HW, 3), np.uint8)
    labels = np.zeros((n, MAX_LABELS, 5), np.float32)
    for i, t in enumerate(texts):
        img, boxes = render_band_with_boxes(t, nprng)
        hrs[i] = img
        lab = band_labels_on_canvas(boxes)
        labels[i, :min(len(lab), MAX_LABELS)] = lab[:MAX_LABELS]
    return hrs, labels


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr0", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pool", type=int, default=8192)
    ap.add_argument("--p-sr", type=float, default=0.5,
                    help="fraction of band samples shown as LPSR output")
    ap.add_argument("--p-tworow", type=float, default=0.3,
                    help="fraction of the batch drawn from the host "
                    "pipeline-domain pool (bordered plates, both fonts)")
    ap.add_argument("--out", default="checkpoints/char_ocr_synth.npz")
    ap.add_argument("--init", default=None,
                    help="warm-start params from a prior .npz")
    ap.add_argument("--lpsr", default="checkpoints/lpsr_synth_glare/"
                    "best_model.npz")
    ap.add_argument("--kernels", default="/root/reference/estimated-kn")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--protocol-check", action="store_true",
                    help="after training, run the n=64 protocol eval with "
                    "the self-trained OCR + the committed glare LPSR")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpr_tpu_jax_cache")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import lpr_tpu.ops.image as im
    from lpr_tpu.data.degradation import (DegradationConfig, LPDegradation,
                                          apply_estimated_kernel,
                                          load_estimated_kernels)
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply
    from lpr_tpu.models.yolo import build_yolo, char_ocr_spec
    from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer, validate_map
    from lpr_tpu.utils.autoanchor import kmeans_anchors
    from lpr_tpu.weights.checkpoint import load_params, save_params

    rng = random.Random(args.seed)
    print(f"rendering HR pool ({args.pool})...", flush=True)
    hrs, band_labels = build_pool(args.pool, args.seed)
    n_two_pool = max(args.pool // 4, 256)
    print(f"rendering two-row pool ({n_two_pool})...", flush=True)
    two_imgs = np.zeros((n_two_pool, IMGSZ, IMGSZ, 3), np.uint8)
    two_labels = np.zeros((n_two_pool, MAX_LABELS, 5), np.float32)
    for i in range(n_two_pool):
        img, lab = tworow_sample(rng)
        two_imgs[i] = img
        n = min(len(lab), MAX_LABELS)
        if n:
            two_labels[i, :n] = lab[:n]

    # ---- device-side LR construction: the r3c protocol regime ----------
    deg = LPDegradation(
        DegradationConfig(gaussian_sigma_range=(0.8, 1.2),
                          noise_level_range=(0.010, 0.020),
                          scale=0.55, lr_hw=LR_HW,
                          p_glare=0.3,
                          glare_radius_range=(0.35, 0.60),
                          glare_alpha_range=(0.55, 0.95)),
        hr_hw=HR_HW,
    )
    kernels = None
    if os.path.isdir(args.kernels):
        try:
            kernels = jnp.asarray(load_estimated_kernels(args.kernels))
            if kernels.shape[0] == 0:
                kernels = None
        except Exception as e:
            print(f"# estimated kernels unavailable: {e}", file=sys.stderr)

    lcfg = LPSRConfig()
    lpsr_params = load_lpsr(args.lpsr, lcfg) if os.path.exists(args.lpsr) \
        else None
    if lpsr_params is None:
        print("# no LPSR checkpoint; SR-path samples disabled",
              file=sys.stderr)

    @jax.jit
    def make_band_canvases(key, hr8):
        """HR renders -> protocol LR crops (30% estimated-kernel pass,
        classical degradation + glare, contrast wash) -> for a random
        p_sr fraction, the committed LPSR's actual output (uint8
        round-trip like the harness) -> letterboxed 128^2 canvases."""
        hr = hr8.astype(jnp.float32) / 255.0
        b = hr.shape[0]
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        if kernels is not None:
            blurred = jax.vmap(
                lambda k, x: apply_estimated_kernel(k, x, kernels)
            )(jax.random.split(k1, b), hr)
            gate = jax.random.uniform(k2, (b, 1, 1, 1)) < 0.3
            hr = jnp.where(gate, blurred, hr)
        lr = deg(k3, hr)
        c = jax.random.uniform(k4, (b, 1, 1, 1), minval=0.60, maxval=0.85)
        m = jax.random.uniform(k5, (b, 1, 1, 1), minval=0.55, maxval=0.8)
        lr = jnp.clip(lr * c + (1 - c) * m, 0.0, 1.0)
        content = lr
        if lpsr_params is not None:
            sr = lpsr_apply(lpsr_params, lr, lcfg)
            rgb = jnp.repeat(sr, 3, axis=-1) if sr.shape[-1] == 1 else sr
            rgb = im.uint8_to_float(im.float_to_uint8(rgb))
            sel = jax.random.uniform(k6, (b, 1, 1, 1)) < args.p_sr
            content = jnp.where(sel, rgb, lr)
        band = im.resize_bilinear(content, (BAND_NH, IMGSZ))
        canvas = jnp.zeros((b, IMGSZ, IMGSZ, 3), jnp.float32)
        return jax.lax.dynamic_update_slice(canvas, band,
                                            (0, BAND_TOP, 0, 0))

    n_two = int(round(args.batch * args.p_tworow))
    n_band = args.batch - n_two

    # pools live on device once (explicit jit ARGUMENTS, not closure
    # constants — captured constants get embedded in the compile payload,
    # which overflows the dev tunnel's remote-compile request limit);
    # per-step traffic is two index vectors.
    hrs_dev = jax.device_put(hrs)
    band_labels_dev = jax.device_put(band_labels)
    two_imgs_dev = jax.device_put(two_imgs)
    two_labels_dev = jax.device_put(two_labels)

    @jax.jit
    def assemble(key, band_idx, two_idx, hp, blp, tp, tlp):
        canv = make_band_canvases(key, jnp.take(hp, band_idx, 0))
        imgs = jnp.concatenate(
            [canv, jnp.take(tp, two_idx, 0).astype(jnp.float32) / 255.0],
            axis=0)
        labels = jnp.concatenate(
            [jnp.take(blp, band_idx, 0), jnp.take(tlp, two_idx, 0)], axis=0)
        return imgs, labels

    def make_batch(key):
        band_idx = jnp.asarray(
            [rng.randrange(args.pool) for _ in range(n_band)], jnp.int32)
        two_idx = jnp.asarray(
            [rng.randrange(n_two_pool) for _ in range(n_two)], jnp.int32)
        return assemble(key, band_idx, two_idx, hrs_dev, band_labels_dev,
                        two_imgs_dev, two_labels_dev)

    # ---- AutoAnchor over the actual label statistics --------------------
    wh = np.concatenate(
        [band_labels[band_labels[..., 3] > 0][:, 3:5],
         two_labels[two_labels[..., 3] > 0][:, 3:5]], 0) * IMGSZ
    anchors_px = kmeans_anchors(wh, n=2, thr=4.0, gen=300, seed=0)
    anchors = (anchors_px / 8.0).reshape(1, 2, 2).astype(np.float32)
    print(f"AutoAnchor anchors (grid units): {anchors.reshape(2, 2).tolist()}",
          flush=True)

    model = build_yolo(char_ocr_spec(), ckpt_anchors=anchors, strides=(8,))
    trainer = YoloTrainer(
        model,
        YoloTrainConfig(lr0=args.lr0, warmup_epochs=0.5,
                        epochs=max(args.steps // 50, 1)),
        steps_per_epoch=50,
    )
    state = trainer.init(jax.random.PRNGKey(args.seed))
    if args.init:
        state["params"] = load_params(args.init, state["params"])
        state["ema"] = load_params(args.init, state["ema"])

    key = jax.random.PRNGKey(args.seed + 1)
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        imgs, labels = make_batch(sub)
        state, total, comps = trainer.step(
            state, jnp.asarray(imgs), jnp.asarray(labels))
        if it % 200 == 0:
            print(f"step {it}: loss {float(total):.4f} "
                  f"(box {float(comps['box']):.3f} "
                  f"obj {float(comps['obj']):.3f} "
                  f"cls {float(comps['cls']):.3f})", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    ema_fp16 = jax.tree.map(lambda a: np.asarray(a, np.float16), state["ema"])
    save_params(args.out, ema_fp16, __anchors__=anchors)
    print("saved", args.out, flush=True)

    # self-check 1: detection mAP on fresh batches
    key, k1, k2 = jax.random.split(key, 3)
    val = [make_batch(k1), make_batch(k2)]
    metrics = validate_map(model, state["ema"], val, conf_thres=0.01)
    print(f"val mAP50 {metrics['map50']:.3f} mAP {metrics['map']:.3f}",
          flush=True)

    if args.protocol_check:
        protocol_check(args.out)


def protocol_check(ckpt: str, n: int = 64):
    """n-image r3c-regime protocol eval with the self-trained OCR."""
    import tempfile

    import make_eval_set
    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.models.yolo import load_char_ocr

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    glare = os.path.join(repo, "checkpoints", "lpsr_synth_glare",
                         "best_model.npz")
    out = tempfile.mkdtemp(prefix="charocr_eval_")
    make_eval_set.main([
        "--out", out, "--n", str(n),
        "--sigma", "0.8", "1.2", "--noise", "0.010", "0.020",
        "--scale", "0.55", "--wash", "0.60", "0.85",
        "--glare-p", "0.3", "--render-style", "plate"])
    char, char_params, ck = load_char_ocr(ckpt)
    lcfg = LPSRConfig()
    lp = load_lpsr(glare, lcfg)
    ev = OcrEvaluator(char, char_params, lp, lcfg, names=ck.names)
    rep = ev.evaluate_folder(out, batch_size=n)
    print(f"protocol n={n} with SELF-TRAINED OCR: "
          f"raw {rep.acc_raw*100:.2f}%/{rep.cer_raw*100:.2f}%  "
          f"sr {rep.acc_sr*100:.2f}%/{rep.cer_sr*100:.2f}%", flush=True)


if __name__ == "__main__":
    main()
