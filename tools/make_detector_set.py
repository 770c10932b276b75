"""Materialize a synthetic street-scene detector dataset to disk.

Renders plate-bearing frames at arbitrary geometry (640x640 for training,
736x1280 rect for production-geometry validation — the reference plate
detector's serving shape, onnx_models/detection/config.pbtxt:8-10) with
YOLO-format labels, in the ``--img-dir``/``--label-dir`` layout consumed by
``lpr_tpu.cli.train_yolo``.  Scenes carry structured clutter (vehicle-ish
blocks, signage text distractors, lighting gradients, blur/noise) so the
detection task is non-trivial and val mAP is a meaningful number.

Classes follow the reference's 11-class map (detect_class_names.txt):
7 = square (two-row) license plate, 8 = rectangle (one-row) license plate.

``--photo`` enables the round-5 photographic-realism mode (the sim-to-real
fix: the round-4 generator's gradient+block scenes produced a detector that
finds nothing in a real photograph, tools/probe_real_frame.py): real-photo
and 1/f-noise backgrounds, vehicle-rear plate mounting, much smaller plate
scales (down to the ~20 px plates of the reference's demo frame), alpha-
blended paste, photometric plate/background matching, JPEG round-trips,
estimated real-world motion-blur kernels, color casts, and plate-free
negative frames.  Real plate crops mined from the reference's figures are
composited as extra positives — the two demo-frame eval plates are
excluded (they are the held-out real benchmark).

Usage:
  python tools/make_detector_set.py --out .det640 --n 2000 --val-n 200
  python tools/make_detector_set.py --out .detreal --n 3000 --val-n 300 --photo
  python tools/make_detector_set.py --out .det_rect --n 0 --val-n 200 \
      --height 736 --width 1280
"""

from __future__ import annotations

import argparse
import io
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw, ImageFont, ImageFilter

from tools.synth_plates import FONT, random_plate_text, render_plate

# Real photographs shipped as sample data in the reference's vendored
# yolov5 (public COCO sample images) — background texture only.  The demo
# street frame (imgs/image.png) is the held-out eval and is NEVER loaded.
PHOTO_BG_PATHS = [
    "/root/reference/yolov5/data/images/bus.jpg",
    "/root/reference/yolov5/data/images/zidane.jpg",
]
# Real plate crops mined from the reference's report/experiment figures
# (tools/mine_real_plates.py, tools/mine_report_plates.py).  The demo-frame
# eval plates 51G18593 / 51A02352 are excluded from compositing.
REAL_CROP_DIRS = ["tests/fixtures/real_plates", "tests/fixtures/real_plates_cn"]
REAL_CROP_EXTRA = [
    "tests/fixtures/real_plates2/11A05826.png",
    "tests/fixtures/real_plates2/12A08027.png",
    "tests/fixtures/real_plates2/12A10087.png",
]


def _background(rng: random.Random, w: int, h: int) -> Image.Image:
    """Street-ish background: sky/road gradient + building & vehicle blocks
    + lane lines + signage distractor text."""
    base = np.zeros((h, w, 3), np.float32)
    sky = np.array([rng.uniform(90, 180)] * 3, np.float32) + rng.uniform(-20, 20)
    road = np.array([rng.uniform(40, 90)] * 3, np.float32)
    t = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None, None]
    base += (1 - t) * sky + t * road
    img = Image.fromarray(np.clip(base, 0, 255).astype(np.uint8))
    d = ImageDraw.Draw(img)
    # building / vehicle blocks
    for _ in range(rng.randint(6, 14)):
        bw = rng.randint(w // 10, w // 3)
        bh = rng.randint(h // 10, h // 3)
        x = rng.randint(-bw // 2, w - bw // 2)
        y = rng.randint(-bh // 2, h - bh // 2)
        c = tuple(rng.randint(25, 200) for _ in range(3))
        d.rectangle([x, y, x + bw, y + bh], fill=c,
                    outline=tuple(min(255, v + 30) for v in c))
    # lane-ish lines
    for _ in range(rng.randint(2, 6)):
        x0, x1 = rng.randint(0, w), rng.randint(0, w)
        d.line([x0, rng.randint(h // 2, h), x1, h], width=rng.randint(2, 6),
               fill=(rng.randint(150, 230),) * 3)
    # signage text distractors (plate-like glyphs in non-plate context)
    for _ in range(rng.randint(1, 4)):
        fs = rng.randint(max(h // 40, 8), max(h // 14, 10))
        try:
            font = ImageFont.truetype(FONT, fs)
        except OSError:
            font = ImageFont.load_default()
        txt = "".join(rng.choice("0123456789ABCDEFGHKLMNPRSTUVXYZ ")
                      for _ in range(rng.randint(3, 9)))
        d.text((rng.randint(0, max(w - 8 * fs, 1)),
                rng.randint(0, max(h - fs - 1, 1))), txt,
               fill=tuple(rng.randint(10, 240) for _ in range(3)), font=font)
    return img


_PHOTO_POOL = None
_REAL_CROPS = None
_BLUR_KERNELS = None


def _photo_pool():
    global _PHOTO_POOL
    if _PHOTO_POOL is None:
        _PHOTO_POOL = [
            np.asarray(Image.open(p).convert("RGB"))
            for p in PHOTO_BG_PATHS if os.path.exists(p)
        ]
    return _PHOTO_POOL


def _real_crops():
    global _REAL_CROPS
    if _REAL_CROPS is None:
        paths = list(REAL_CROP_EXTRA)
        for d in REAL_CROP_DIRS:
            if os.path.isdir(d):
                paths += [os.path.join(d, f) for f in sorted(os.listdir(d))
                          if f.endswith(".png")]
        _REAL_CROPS = [np.asarray(Image.open(p).convert("RGB"))
                       for p in paths if os.path.exists(p)]
    return _REAL_CROPS


def _blur_kernels():
    global _BLUR_KERNELS
    if _BLUR_KERNELS is None:
        try:
            from lpr_tpu.data.degradation import load_estimated_kernels

            _BLUR_KERNELS = np.asarray(load_estimated_kernels())
        except Exception:
            _BLUR_KERNELS = np.zeros((0, 1, 1), np.float32)
    return _BLUR_KERNELS


def _noise_texture(rng: random.Random, w: int, h: int) -> Image.Image:
    """Multi-octave value noise — 1/f-ish spectrum like natural imagery."""
    rs = np.random.RandomState(rng.randint(0, 1 << 30))
    acc = np.zeros((h, w), np.float32)
    amp = 1.0
    for cells in (4, 8, 16, 32, 64):
        grid = rs.rand(cells, cells).astype(np.float32)
        up = np.asarray(Image.fromarray(grid * 255).resize((w, h),
                                                           Image.BILINEAR))
        acc += amp * up
        amp *= 0.55
    acc = (acc - acc.min()) / max(np.ptp(acc), 1e-6)
    base = np.array([rng.uniform(40, 160) for _ in range(3)], np.float32)
    span = rng.uniform(40, 120)
    img = base + acc[..., None] * span * np.array(
        [rng.uniform(0.7, 1.3) for _ in range(3)], np.float32)
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


def _photo_background(rng: random.Random, w: int, h: int) -> Image.Image:
    """Background draw: real-photo crop (p=.55) / noise texture (p=.2) /
    procedural street (p=.25)."""
    pool = _photo_pool()
    u = rng.random()
    if pool and u < 0.55:
        src = pool[rng.randrange(len(pool))]
        sh, sw = src.shape[:2]
        # random crop with aspect near target, random scale
        scale = rng.uniform(0.35, 1.0)
        cw = max(int(sw * scale), 32)
        ch = max(int(cw * h / w), 32)
        if ch > sh:
            ch = sh
            cw = max(int(ch * w / h), 32)
        x0 = rng.randint(0, max(sw - cw, 0))
        y0 = rng.randint(0, max(sh - ch, 0))
        crop = src[y0:y0 + ch, x0:x0 + cw]
        if rng.random() < 0.5:
            crop = crop[:, ::-1]
        img = Image.fromarray(crop).resize((w, h), Image.BILINEAR)
        # color jitter so two draws from the same photo differ
        arr = np.asarray(img, np.float32)
        arr = arr * rng.uniform(0.75, 1.2) + rng.uniform(-18, 18)
        cast = np.array([rng.uniform(0.9, 1.1) for _ in range(3)], np.float32)
        return Image.fromarray(np.clip(arr * cast, 0, 255).astype(np.uint8))
    if u < 0.75:
        return _noise_texture(rng, w, h)
    return _background(rng, w, h)


def _vehicle_rear(rng: random.Random, pw: int, ph: int):
    """A vehicle-rear context patch with the plate region cut out of it:
    body color, window band, taillights.  Returns (patch_img, plate_xy)."""
    vw = int(pw * rng.uniform(2.2, 4.5))
    vh = int(ph * rng.uniform(2.5, 5.0))
    body = tuple(rng.randint(25, 230) for _ in range(3))
    img = Image.new("RGB", (vw, vh), body)
    d = ImageDraw.Draw(img)
    # rear window / dark band at top
    d.rectangle([int(vw * 0.12), 0, int(vw * 0.88), int(vh * rng.uniform(0.2, 0.4))],
                fill=tuple(max(0, c - rng.randint(60, 120)) for c in body))
    # taillights
    ly = int(vh * rng.uniform(0.45, 0.65))
    lh = max(2, int(vh * 0.1))
    lw = max(3, int(vw * rng.uniform(0.08, 0.16)))
    red = (rng.randint(150, 255), rng.randint(10, 70), rng.randint(10, 60))
    d.rectangle([int(vw * 0.03), ly, int(vw * 0.03) + lw, ly + lh], fill=red)
    d.rectangle([vw - int(vw * 0.03) - lw, ly, vw - int(vw * 0.03), ly + lh],
                fill=red)
    # plate mount position: bottom-center
    px = (vw - pw) // 2 + rng.randint(-vw // 12, vw // 12)
    py = int(vh * rng.uniform(0.62, 0.82))
    py = min(py, vh - ph - 1)
    return img, (max(px, 0), max(py, 0))


def _paste_soft(img: Image.Image, crop: np.ndarray, x: int, y: int,
                rng: random.Random) -> None:
    """Alpha-blend paste with feathered edges — avoids the crisp cut-out
    boundary that made pasted plates trivially separable from photo
    backgrounds."""
    ch, cw = crop.shape[:2]
    mask = np.ones((ch, cw), np.float32) * 255
    feather = max(1, min(ch, cw) // 10)
    for i in range(feather):
        a = 255.0 * (i + 1) / (feather + 1)
        mask[i, :] = np.minimum(mask[i, :], a)
        mask[ch - 1 - i, :] = np.minimum(mask[ch - 1 - i, :], a)
        mask[:, i] = np.minimum(mask[:, i], a)
        mask[:, cw - 1 - i] = np.minimum(mask[:, cw - 1 - i], a)
    m = Image.fromarray(mask.astype(np.uint8), "L")
    img.paste(Image.fromarray(crop), (x, y), m)


def _match_photometry(crop: np.ndarray, bg: np.ndarray,
                      rng: random.Random) -> np.ndarray:
    """Pull the pasted crop's exposure/cast toward the local background so
    plates share the scene's illumination (real plates are lit by the
    scene, not rendered at reference white)."""
    c = crop.astype(np.float32)
    local = bg.astype(np.float32).mean(axis=(0, 1))
    target_l = np.clip(local.mean(), 40.0, 220.0)
    gain = (target_l / max(c.mean(), 1.0)) ** rng.uniform(0.4, 0.8)
    gain *= rng.uniform(0.8, 1.15)
    cast = local / max(local.mean(), 1.0)
    cast = cast ** rng.uniform(0.2, 0.6)
    return np.clip(c * gain * cast, 0, 255).astype(np.uint8)


# saturated UI/OSD overlay colors (the demo frame uses pure green/yellow)
_OSD_COLORS = [(0, 255, 0), (255, 255, 0), (255, 0, 0), (0, 255, 255),
               (255, 0, 255), (0, 128, 255), (255, 255, 255)]


def render_scene_photo(rng: random.Random, w: int, h: int,
                       max_plates: int = 3, neg_p: float = 0.15,
                       occlude_p: float = 0.0, ring_p: float = 0.15,
                       frac_hi: float = 0.22, frac_hi_small: float = 0.06):
    """Photographic-realism scene (round 5).  Same label contract as
    render_scene.  ``occlude_p``: probability a pasted plate gets partially
    occluded by a random bar/blob (adversarial-val mode; the label is
    kept, as for real partial occlusions)."""
    img = _photo_background(rng, w, h)
    labels = []
    boxes = []
    if rng.random() >= neg_p:
        n = rng.randint(1, max_plates)
        scale_ref = min(w, h)
        reals = _real_crops()
        for _ in range(n):
            use_real = reals and rng.random() < 0.25
            two = rng.random() < 0.35
            if use_real:
                src = reals[rng.randrange(len(reals))]
                ar = src.shape[1] / src.shape[0]
                two = ar < 1.5
            # plate width: 1.6% .. 22% of min dim — the real demo frame's
            # plates are ~2.4% (21 px in a 880x495 frame)
            frac = rng.uniform(0.016, frac_hi) if rng.random() < 0.5 \
                else rng.uniform(0.016, frac_hi_small)  # bias small
            pw = max(int(scale_ref * frac), 10)
            if two:
                ph = int(pw * rng.uniform(0.60, 0.85))
            else:
                ph = max(int(pw * rng.uniform(0.22, 0.34)), 6)
            ph = max(ph, 7)
            mounted = rng.random() < 0.5
            ctx_w, ctx_h = (pw, ph)
            if mounted:
                veh, (mx, my) = _vehicle_rear(rng, pw, ph)
                ctx_w, ctx_h = veh.size
            for _try in range(20):
                x1 = rng.randint(0, max(w - ctx_w - 1, 1))
                y1 = rng.randint(0, max(h - ctx_h - 1, 1))
                box = (x1, y1, x1 + ctx_w, y1 + ctx_h)
                if all(box[2] < b[0] or box[0] > b[2] or box[3] < b[1]
                       or box[1] > b[3] for b in boxes):
                    break
            else:
                continue
            boxes.append(box)
            if use_real:
                crop = np.asarray(Image.fromarray(src).resize(
                    (pw, ph), Image.BILINEAR))
            else:
                text = random_plate_text(rng, two)
                crop = render_plate(text, two, size=(pw, ph),
                                    angle_deg=rng.uniform(-8, 8))
            bg_arr = np.asarray(img)
            ly0, ly1 = max(y1 - ph, 0), min(y1 + 2 * ph, h)
            lx0, lx1 = max(x1 - pw, 0), min(x1 + 2 * pw, w)
            crop = _match_photometry(crop, bg_arr[ly0:ly1, lx0:lx1], rng)
            if mounted:
                img.paste(veh, (x1, y1))
                px, py = x1 + mx, y1 + my
            else:
                px, py = x1, y1
            _paste_soft(img, crop, px, py, rng)
            if occlude_p > 0 and rng.random() < occlude_p:
                d = ImageDraw.Draw(img)
                oc = tuple(rng.randint(15, 220) for _ in range(3))
                if rng.random() < 0.5:  # vertical bar (pole/frame edge)
                    ow = max(2, int(pw * rng.uniform(0.1, 0.3)))
                    ox = px + rng.randint(0, max(pw - ow, 1))
                    d.rectangle([ox, py - 2, ox + ow, py + ph + 2], fill=oc)
                else:  # corner blob (dirt/sticker)
                    r_ = max(2, int(ph * rng.uniform(0.3, 0.7)))
                    ox = px + rng.choice([0, pw - r_])
                    oy = py + rng.choice([0, ph - r_])
                    d.ellipse([ox, oy, ox + r_, oy + r_], fill=oc)
            if rng.random() < ring_p:
                # annotation/OSD burn-in ring: footage that has passed
                # through a detector UI or DVR overlay carries thin
                # saturated rectangle outlines drawn tight around objects
                # (the reference's own committed demo frame, imgs/image.png,
                # has exactly this around both plates) — the label is kept:
                # a plate inside a drawn box is still a plate
                d = ImageDraw.Draw(img)
                pad = rng.randint(1, 5)
                lw = rng.randint(1, 3)
                d.rectangle([px - pad, py - pad, px + pw + pad,
                             py + ph + pad],
                            outline=rng.choice(_OSD_COLORS), width=lw)
                if rng.random() < 0.5:
                    d.text((px + rng.randint(-4, pw // 2),
                            py - pad - rng.randint(8, 16)),
                           rng.choice(["#1", "#2", "#3", "P", "LP", "car"]),
                           fill=(255, 255, 255))
            cls = 7.0 if two else 8.0
            labels.append((cls, (px + pw / 2) / w, (py + ph / 2) / h,
                           pw / w, ph / h))
    if rng.random() < 0.25:
        # unlabeled OSD distractors: rings/text NOT around a plate, so the
        # outline alone does not become a plate cue
        d = ImageDraw.Draw(img)
        for _ in range(rng.randint(1, 3)):
            bw_ = rng.randint(10, max(w // 6, 12))
            bh_ = rng.randint(6, max(h // 8, 8))
            bx = rng.randint(0, max(w - bw_ - 1, 1))
            by = rng.randint(0, max(h - bh_ - 1, 1))
            if any(bx < b[2] and bx + bw_ > b[0] and by < b[3]
                   and by + bh_ > b[1] for b in boxes):
                continue
            if rng.random() < 0.6:
                d.rectangle([bx, by, bx + bw_, by + bh_],
                            outline=rng.choice(_OSD_COLORS),
                            width=rng.randint(1, 3))
            else:
                d.text((bx, by), rng.choice(
                    ["CAM 01", "REC", "12:04:31", "#4", "ID 7"]),
                    fill=rng.choice(_OSD_COLORS))
    # global photometric chain
    arr = np.asarray(img, np.float32)
    kernels = _blur_kernels()
    if len(kernels) and rng.random() < 0.3:
        try:
            import cv2

            k = kernels[rng.randrange(len(kernels))].astype(np.float32)
            k = k / max(k.sum(), 1e-6)
            arr = cv2.filter2D(arr, -1, k)
        except ImportError:
            pass
    elif rng.random() < 0.6:
        arr = np.asarray(
            Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).filter(
                ImageFilter.GaussianBlur(rng.uniform(0.3, 1.6))),
            np.float32)
    arr = arr * rng.uniform(0.75, 1.2) + rng.uniform(-18, 18)
    cast = np.array([rng.uniform(0.88, 1.12) for _ in range(3)], np.float32)
    arr = arr * cast
    arr += np.random.RandomState(rng.randint(0, 1 << 30)).normal(
        0, rng.uniform(1.0, 9.0), arr.shape)
    out = np.clip(arr, 0, 255).astype(np.uint8)
    # JPEG round-trip at random quality (sensor/codec artifacts)
    if rng.random() < 0.7:
        buf = io.BytesIO()
        Image.fromarray(out).save(buf, "JPEG", quality=rng.randint(28, 88))
        buf.seek(0)
        out = np.asarray(Image.open(buf).convert("RGB"))
    return out, labels


def render_scene(rng: random.Random, w: int, h: int, max_plates: int = 3):
    """One frame + its labels: [(cls, cx, cy, bw, bh) normalized]."""
    img = _background(rng, w, h)
    labels = []
    boxes = []
    n = rng.randint(1, max_plates)
    scale_ref = min(w, h)
    for _ in range(n):
        two = rng.random() < 0.35
        text = random_plate_text(rng, two)
        if two:
            pw = rng.randint(int(scale_ref * 0.06), int(scale_ref * 0.22))
            ph = int(pw * rng.uniform(0.60, 0.80))
        else:
            pw = rng.randint(int(scale_ref * 0.08), int(scale_ref * 0.35))
            ph = int(pw * rng.uniform(0.22, 0.34))
        pw, ph = max(pw, 16), max(ph, 10)
        for _try in range(20):
            x1 = rng.randint(0, w - pw - 1)
            y1 = rng.randint(0, h - ph - 1)
            box = (x1, y1, x1 + pw, y1 + ph)
            if all(box[2] < b[0] or box[0] > b[2] or box[3] < b[1]
                   or box[1] > b[3] for b in boxes):
                break
        else:
            continue
        boxes.append(box)
        crop = render_plate(text, two, size=(pw, ph),
                            angle_deg=rng.uniform(-6, 6))
        # local illumination on the plate
        gain = rng.uniform(0.55, 1.1)
        crop = np.clip(crop.astype(np.float32) * gain, 0, 255).astype(np.uint8)
        img.paste(Image.fromarray(crop), (x1, y1))
        cls = 7.0 if two else 8.0
        labels.append((cls, (x1 + pw / 2) / w, (y1 + ph / 2) / h,
                       pw / w, ph / h))
    # global photometric: blur + sensor noise + exposure
    if rng.random() < 0.7:
        img = img.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.4)))
    arr = np.asarray(img, np.float32)
    arr = arr * rng.uniform(0.8, 1.15) + rng.uniform(-15, 15)
    arr += np.random.RandomState(rng.randint(0, 1 << 30)).normal(
        0, rng.uniform(1.0, 7.0), arr.shape)
    return np.clip(arr, 0, 255).astype(np.uint8), labels


def write_split(out: str, split: str, n: int, w: int, h: int,
                seed: int, max_plates: int, photo: bool = False,
                neg_p: float = 0.15, occlude_p: float = 0.0,
                ring_p: float = 0.15, frac_hi: float = 0.22,
                frac_hi_small: float = 0.06) -> None:
    img_dir = os.path.join(out, split, "images")
    lbl_dir = os.path.join(out, split, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    rng = random.Random(seed)
    for i in range(n):
        if photo:
            frame, labels = render_scene_photo(rng, w, h, max_plates, neg_p,
                                               occlude_p, ring_p, frac_hi,
                                               frac_hi_small)
        else:
            frame, labels = render_scene(rng, w, h, max_plates)
        stem = f"{split}_{i:05d}"
        Image.fromarray(frame).save(os.path.join(img_dir, stem + ".jpg"),
                                    quality=90)
        with open(os.path.join(lbl_dir, stem + ".txt"), "w") as f:
            for cls, cx, cy, bw, bh in labels:
                f.write(f"{int(cls)} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
    print(f"{split}: {n} frames at {w}x{h} -> {img_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--val-n", type=int, default=200)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-plates", type=int, default=3)
    ap.add_argument("--photo", action="store_true",
                    help="round-5 photographic-realism mode (see module doc)")
    ap.add_argument("--neg-p", type=float, default=0.15,
                    help="plate-free negative-frame probability (photo mode)")
    ap.add_argument("--occlude-p", type=float, default=0.0,
                    help="per-plate partial-occlusion probability "
                         "(adversarial val mode)")
    ap.add_argument("--ring-p", type=float, default=0.15,
                    help="per-plate OSD burn-in ring probability (photo)")
    ap.add_argument("--frac-hi", type=float, default=0.22,
                    help="max plate width as fraction of min dim (photo)")
    ap.add_argument("--frac-hi-small", type=float, default=0.06,
                    help="max plate width for the small-biased half (photo)")
    args = ap.parse_args()
    if args.n:
        write_split(args.out, "train", args.n, args.width, args.height,
                    args.seed, args.max_plates, args.photo, args.neg_p,
                    args.occlude_p, args.ring_p, args.frac_hi,
                    args.frac_hi_small)
    if args.val_n:
        write_split(args.out, "val", args.val_n, args.width, args.height,
                    args.seed + 10_000, args.max_plates, args.photo,
                    args.neg_p, args.occlude_p, args.ring_p, args.frac_hi,
                    args.frac_hi_small)


if __name__ == "__main__":
    main()
