"""Train the CycleGAN LR-generator on the REAL low-resolution domain.

The reference's G_AtoB was trained on unpaired real captures so synthetic
LR data looks real (``train/cyclegans.py:24-141``), then routed into LPSR
training data at a 60% rate (``my_utils/create_lr.py:45-90``).  The
round-4 committed ``demo_cyclegan_g.npz`` only ever saw synthetic domains —
the direct cause of the 0%-exact wall on the real VN fixtures (VERDICT.md
round-4 missing #2).  This tool points domain B at every real LR capture
the reference ships:

- the 6 VN report crops (``tests/fixtures/real_plates``, mined from
  imgs/sr_convincing_improvements.png — blue-gray washed night captures);
- the 4 kernel-figure strips (``tests/fixtures/real_lr_strips``, mined
  from imgs/kere.png — blue-cast / underexposed / washed / saturated).

The two demo-frame eval plates (real_plates2: 51G18593, 51A02352) are
EXCLUDED — they are the held-out real benchmark.

Ten exemplars is few-shot for a GAN, so domain B is augment-expanded
(random resized crops, photometric jitter, small rotations, noise) to a
pool, and the shipped snapshot is selected by REAL-DOMAIN STATISTICS, not
by OCR-legibility (real LR raw CER is ~98% — a faithful real-LR generator
must destroy OCR, so the demo tool's legibility criterion would reject
exactly the checkpoints we want): the score is the distance between
G(clean) batch statistics and the real pool's (per-channel mean/std +
mean gradient magnitude), lower = better.

Usage:
  python tools/train_cyclegan_real.py --out checkpoints/cyclegan_real_g.npz \
      [--steps 6000] [--select-every 250]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np

REAL_LR_GLOBS = [
    "tests/fixtures/real_plates/*.png",
    "tests/fixtures/real_lr_strips/*.png",
]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="checkpoints/cyclegan_real_g.npz")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pool", type=int, default=1024,
                   help="samples per domain after augment expansion")
    p.add_argument("--seed-a", type=int, default=4,
                   help="domain-A text seed (differs from eval seed 0)")
    p.add_argument("--hw", type=int, nargs=2, default=(32, 192))
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--select-every", type=int, default=250)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    return p.parse_args(argv)


def load_real_strips():
    from PIL import Image

    paths = []
    for g in REAL_LR_GLOBS:
        paths += sorted(glob.glob(g))
    assert paths, "no real LR fixtures found — run the mine_* tools first"
    return [np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            for p in paths], paths


def expand_real_pool(strips, n, h, w, seed):
    """Augment-expand few real strips into an unpaired style pool."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    out = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        s = strips[rng.randint(len(strips))]
        sh, sw = s.shape[:2]
        # random resized crop (keep most of the plate: these are tight crops)
        ch = int(sh * rng.uniform(0.82, 1.0))
        cw = int(sw * rng.uniform(0.82, 1.0))
        y0 = rng.randint(0, sh - ch + 1)
        x0 = rng.randint(0, sw - cw + 1)
        crop = s[y0:y0 + ch, x0:x0 + cw]
        img = Image.fromarray((crop * 255).astype(np.uint8))
        if rng.rand() < 0.5:
            img = img.rotate(rng.uniform(-3, 3), Image.BILINEAR, expand=False)
        img = img.resize((w, h), Image.BILINEAR)
        a = np.asarray(img, np.float32) / 255.0
        # photometric jitter: exposure, contrast, per-channel cast, noise
        a = (a - 0.5) * rng.uniform(0.85, 1.15) + 0.5
        a = a * rng.uniform(0.85, 1.15) + rng.uniform(-0.06, 0.06)
        a = a * rng.uniform(0.92, 1.08, size=(1, 1, 3))
        a = a + rng.normal(0, rng.uniform(0.0, 0.02), a.shape)
        out[i] = np.clip(a, 0.0, 1.0)
    return out


def render_clean_pool(args):
    """Domain A: clean tight renders (same recipe as the demo tool)."""
    import random

    from PIL import Image

    from make_eval_set import render_tight_plate
    from synth_plates import random_plate_text

    h, w = args.hw
    rng = random.Random(args.seed_a)
    texts, seen = [], set()
    while len(texts) < args.pool:
        t = random_plate_text(rng, two_row=False)
        if t not in seen:
            seen.add(t)
            texts.append(t)
    nprng = np.random.RandomState(args.seed_a)
    out = np.empty((args.pool, h, w, 3), np.float32)
    for i, t in enumerate(texts):
        # half font / half plate style — matches the clean-LR distribution
        # the unified-v2 trainer routes through this G
        style = "font" if i % 2 == 0 else "plate"
        hr = render_tight_plate(t, nprng, h * 2, w * 2, style=style)
        out[i] = np.asarray(
            Image.fromarray(hr).resize((w, h), Image.BILINEAR),
            np.float32) / 255.0
    return out


def domain_stats(x: np.ndarray) -> np.ndarray:
    """Per-channel mean + per-channel std + mean |gradient| (sharpness) —
    a 7-vector summary of the LR style (color cast, contrast, blur)."""
    mean = x.mean(axis=(0, 1, 2))
    std = x.std(axis=(0, 1, 2))
    gy = np.abs(np.diff(x, axis=1)).mean()
    gx = np.abs(np.diff(x, axis=2)).mean()
    return np.concatenate([mean, std, [(gx + gy) / 2.0]])


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from lpr_tpu.models.cyclegan import generator_apply
    from lpr_tpu.train.cyclegan import CycleGANConfig, CycleGANTrainer
    from lpr_tpu.weights.checkpoint import load_params, save_params

    strips, paths = load_real_strips()
    print(f"real LR exemplars: {len(strips)}", file=sys.stderr)
    for p in paths:
        assert "real_plates2" not in p, "demo-frame eval plates leaked in"

    h, w = args.hw
    b_pool = expand_real_pool(strips, args.pool, h, w, seed=11)
    a_pool = render_clean_pool(args)
    real_stats = domain_stats(b_pool)
    print(f"real-domain stats: {np.round(real_stats, 4)}", file=sys.stderr)

    a_dev = jax.device_put(jnp.asarray(a_pool * 2.0 - 1.0))
    b_dev = jax.device_put(jnp.asarray(b_pool * 2.0 - 1.0))

    trainer = CycleGANTrainer(CycleGANConfig())
    state = trainer.init(jax.random.PRNGKey(args.seed_a))
    if args.resume and os.path.exists(args.resume):
        state = load_params(args.resume, state)
        print(f"resumed trainer state from {args.resume}", file=sys.stderr)

    take = jax.jit(lambda pool, idx: jnp.take(pool, idx, axis=0))
    g_jit = jax.jit(generator_apply)
    state_out = args.out + ".state.npz"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    sel_clean = jnp.asarray(a_pool[:128] * 2.0 - 1.0)

    def stats_score(g_params) -> float:
        fake = np.asarray(jnp.clip(
            g_jit(g_params, sel_clean) * 0.5 + 0.5, 0, 1))
        d = domain_stats(fake) - real_stats
        # weight sharpness equal to the 6 color dims combined: blur is the
        # signature of the real domain
        return float(np.sqrt((d[:6] ** 2).mean()) + abs(d[6]) * 6.0)

    best = {"dist": np.inf, "step": -1, "g": None}
    nprng = np.random.RandomState(0)
    t0 = time.time()
    for step in range(args.steps):
        ia = jnp.asarray(nprng.randint(0, len(a_pool), args.batch))
        ib = jnp.asarray(nprng.randint(0, len(b_pool), args.batch))
        state, m = trainer.step(state, take(a_dev, ia), take(b_dev, ib))
        if step % args.log_every == 0 or step == args.steps - 1:
            print(f"step {step:5d}  G {m['g_loss']:.3f} (id {m['id']:.3f} "
                  f"gan {m['gan']:.3f} cyc {m['cyc']:.3f})  "
                  f"D_A {m['d_a_loss']:.3f} D_B {m['d_b_loss']:.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if args.select_every and step and step % args.select_every == 0:
            d = stats_score(state["g"]["ab"])
            mark = ""
            if d < best["dist"]:
                best.update(dist=d, step=step,
                            g=jax.device_get(state["g"]["ab"]))
                mark = "  <- best"
            print(f"select @ {step:5d}: real-stats dist {d:.4f}{mark}",
                  flush=True)
        if args.ckpt_every and step and step % args.ckpt_every == 0:
            save_params(args.out, state["g"]["ab"])
            save_params(state_out, state)

    save_params(state_out, state)
    if best["g"] is not None:
        print(f"shipping snapshot from step {best['step']} "
              f"(dist {best['dist']:.4f})", flush=True)
        save_params(args.out, best["g"])
    else:
        save_params(args.out, state["g"]["ab"])
    print(f"saved G_AtoB -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
