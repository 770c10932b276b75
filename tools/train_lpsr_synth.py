"""Train LPSR with the repo's own trainer on a synthetic paired set drawn
from the SAME degradation family as the protocol eval set.

This is the round-3 accuracy-north-star proof (VERDICT.md item 1): the
reference published +19.71 pts full-plate accuracy / -18.29 pts CER from its
LPSR on its (private) 1050-image LR set (reference README.md:244-245,
trainer reference train/lpsr.py:97-201).  Here we train the same 310K-param
architecture from scratch on paired (LR, gray-HR) crops whose LR side goes
through exactly the ``tools/make_eval_set.py`` degradation pipeline
(classical model + shipped estimated kernels + contrast wash), with plate
texts DISJOINT from the eval set:

- eval set  = seed 0 texts (the committed 1050-image protocol set);
- train/val = seed 1 texts, any collision with the eval-text set dropped.

The LR construction reuses make_eval_set's own functions so the train and
eval distributions match by construction (only the RNG streams and texts
differ).  Targets follow the reference dataset convention
(dataset/lpsr_dataset.py:26): LR stays RGB, HR is converted to grayscale.

Usage:
  python tools/train_lpsr_synth.py --out checkpoints/lpsr_synth \
      [--epochs 150] [--pool 8192] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

EVAL_SEED = 0       # tools/make_eval_set.py default --seed
EVAL_N = 1050


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="checkpoints/lpsr_synth")
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--pool", type=int, default=8192,
                   help="HR plate pool size (fresh degradations every epoch)")
    p.add_argument("--val", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=1,
                   help="train RNG seed; must differ from the eval set's")
    p.add_argument("--init", default=None,
                   help="optional warm-start checkpoint (.pth/.npz); "
                        "default trains from scratch")
    p.add_argument("--deg", default="",
                   help="extra tools/make_eval_set.py arguments selecting "
                        "the degradation/render regime to train on, e.g. "
                        "'--sigma 0.8 1.2 --glare-p 0.3 --render-style "
                        "plate' (default: the eval builder's defaults)")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    return p.parse_args(argv)


def disjoint_texts(n: int, seed: int):
    """Plate texts for training, disjoint from the eval set's seed-0 texts."""
    import make_eval_set  # noqa: F401  (path side effects)
    from synth_plates import random_plate_text

    eval_rng = random.Random(EVAL_SEED)
    eval_texts, seen = set(), set()
    while len(eval_texts) < EVAL_N:
        t = random_plate_text(eval_rng, two_row=False)
        if t not in seen:
            seen.add(t)
            eval_texts.add(t)

    rng = random.Random(seed)
    out, seen = [], set(eval_texts)
    while len(out) < n:
        t = random_plate_text(rng, two_row=False)
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def main(argv=None):
    args = parse_args(argv)
    assert args.seed != EVAL_SEED, "train seed must differ from the eval set's"
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image

    from make_eval_set import parse_args as eval_args, render_tight_plate
    from lpr_tpu.data.degradation import (DegradationConfig, LPDegradation,
                                          apply_estimated_kernel,
                                          load_estimated_kernels)
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer
    from lpr_tpu.weights.checkpoint import save_params

    # --- the eval set's exact degradation configuration (its CLI defaults,
    # overridable via --deg with the same flags the eval builder takes) ----
    ecfg = eval_args(["--out", "/dev/null"] + args.deg.split())
    hr_hw = (64, 384)
    deg = LPDegradation(
        DegradationConfig(
            gaussian_sigma_range=tuple(ecfg.sigma),
            noise_level_range=tuple(ecfg.noise),
            scale=ecfg.scale, lr_hw=(32, 192),
            p_glare=ecfg.glare_p,
            glare_radius_range=tuple(ecfg.glare_radius),
            glare_alpha_range=tuple(ecfg.glare_alpha),
        ),
        hr_hw=hr_hw,
    )
    kernels = None
    if os.path.isdir(ecfg.kernels):
        try:
            kernels = jnp.asarray(load_estimated_kernels(ecfg.kernels))
            if kernels.shape[0] == 0:
                kernels = None
        except Exception as e:
            print(f"# estimated kernels unavailable: {e}", file=sys.stderr)

    @jax.jit
    def make_lr(key, hr8):
        """make_eval_set.py's per-batch LR construction (kernel gate ->
        classical degradation -> contrast wash), entirely device-side so the
        HR pool never re-crosses the host boundary (the axon tunnel makes
        per-batch host round-trips ~50x slower than the compute)."""
        hr = hr8.astype(jnp.float32) / 255.0
        b = hr.shape[0]
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        if kernels is not None:
            blurred = jax.vmap(
                lambda k, im_: apply_estimated_kernel(k, im_, kernels)
            )(jax.random.split(k1, b), hr)
            gate = jax.random.uniform(k2, (b, 1, 1, 1)) < ecfg.p_estimated
            hr = jnp.where(gate, blurred, hr)
        lr = deg(k3, hr)
        c = jax.random.uniform(k4, (b, 1, 1, 1),
                               minval=ecfg.wash[0], maxval=ecfg.wash[1])
        m = jax.random.uniform(k5, (b, 1, 1, 1), minval=0.55, maxval=0.8)
        return jnp.clip(lr * c + (1 - c) * m, 0.0, 1.0)

    # --- paired pool: HR renders + grayscale targets (uint8, cached) -------
    n_total = args.pool + args.val
    cache = (f"/tmp/lpsr_pool_{args.seed}_{n_total}"
             + (f"_{ecfg.render_style}" if ecfg.render_style != "font"
                else "") + ".npz")
    if os.path.exists(cache):
        z = np.load(cache)
        hrs, tgts = z["hrs"], z["tgts"]
        print(f"loaded HR pool cache {cache}", file=sys.stderr)
    else:
        print(f"rendering {n_total} HR plates (disjoint from eval seed "
              f"{EVAL_SEED})...", file=sys.stderr)
        texts = disjoint_texts(n_total, args.seed)
        nprng = np.random.RandomState(args.seed)
        hrs = np.empty((n_total, *hr_hw, 3), np.uint8)
        tgts = np.empty((n_total, 32, 192, 1), np.uint8)
        for i, t in enumerate(texts):
            hr8 = render_tight_plate(t, nprng, *hr_hw,
                                     style=ecfg.render_style)
            hrs[i] = hr8
            # reference HR target: grayscale at LR size
            # (dataset/lpsr_dataset.py:26)
            g = Image.fromarray(hr8).resize((192, 32), Image.BILINEAR
                                            ).convert("L")
            tgts[i] = np.asarray(g, np.uint8)[..., None]
            if i % 1024 == 0:
                print(f"\r  {i}/{n_total}", end="", file=sys.stderr)
        print(file=sys.stderr)
        np.savez(cache, hrs=hrs, tgts=tgts)

    # pools live on device for the whole run (uint8: ~0.6 GB for 8k plates)
    tr_hr = jax.device_put(hrs[: args.pool])
    tr_tg = jax.device_put(tgts[: args.pool])
    va_hr = jax.device_put(hrs[args.pool:])
    va_tg8 = jax.device_put(tgts[args.pool:])

    key = jax.random.PRNGKey(args.seed)
    key, vkey = jax.random.split(key)
    # fixed validation LR set (degraded once, device-resident)
    va_lr = jnp.concatenate([
        make_lr(jax.random.fold_in(vkey, i), va_hr[s : s + args.batch])
        for i, s in enumerate(range(0, va_hr.shape[0], args.batch))
    ])
    va_tg = va_tg8.astype(jnp.float32) / 255.0

    take = jax.jit(lambda pool, idx: jnp.take(pool, idx, axis=0))
    to_f = jax.jit(lambda t8: t8.astype(jnp.float32) / 255.0)

    trainer = LPSRTrainer(LPSRTrainConfig(lr=args.lr), LPSRConfig())
    init_params = None
    if args.init:
        init_params = load_lpsr(args.init)
        print(f"warm-start from {args.init}", file=sys.stderr)
    state = trainer.init(params=init_params)

    os.makedirs(args.out, exist_ok=True)
    best = -np.inf
    hist = []
    epoch_rng = np.random.RandomState(args.seed + 1)
    for epoch in range(args.epochs):
        t0 = time.time()
        order = epoch_rng.permutation(args.pool)
        losses = []
        for s in range(0, args.pool - args.batch + 1, args.batch):
            idx = jnp.asarray(order[s : s + args.batch])
            key, bk = jax.random.split(key)
            lr_img = make_lr(bk, take(tr_hr, idx))
            state, loss = trainer.step(state, lr_img, to_f(take(tr_tg, idx)))
            losses.append(loss)
        losses = [float(l) for l in losses]
        val_psnr = trainer.validate(
            state,
            ((va_lr[s : s + args.batch], va_tg[s : s + args.batch])
             for s in range(0, len(va_lr), args.batch)),
        )
        state = trainer.plateau_update(state, val_psnr)
        dt = time.time() - t0
        hist.append({"epoch": epoch, "loss": float(np.mean(losses)),
                     "val_psnr": float(val_psnr),
                     "lr_scale": float(state["lr_scale"])})
        print(f"epoch {epoch:3d}  loss {np.mean(losses):.5f}  "
              f"val PSNR {val_psnr:.3f} dB  lr x{float(state['lr_scale']):.4f}"
              f"  ({dt:.1f}s)", flush=True)
        save_params(os.path.join(args.out, "last_model.npz"), state["params"])
        if val_psnr > best:
            best = val_psnr
            save_params(os.path.join(args.out, "best_model.npz"),
                        state["params"])
        with open(os.path.join(args.out, "history.json"), "w") as f:
            json.dump(hist, f)
    print(f"done: best val PSNR {best:.3f} dB -> {args.out}/best_model.npz")


if __name__ == "__main__":
    main()
