"""Train ONE LPSR checkpoint on a mixture of degradation regimes.

Round-4 accuracy-proof de-circularization (VERDICT.md round-3 item 1): the
round-3 headline used per-regime checkpoints (the glare fine-tune wins on the
r3c bimodal/glare protocol set, the 600-epoch uniform checkpoint on the
uniform set).  The reference ships ONE ``best_model.pth`` that covers its
whole evaluation domain (reference README.md:240-245); this tool trains the
same 310K-param LPSR (reference train/lpsr.py:97-201 semantics) on a
per-sample MIXTURE of every regime this repo evaluates on, so a single
checkpoint covers them all without per-set fine-tuning:

- **uniform** — the round-2 protocol regime (``tools/make_eval_set.py``
  CLI defaults: sigma 0.6-1.1, noise 0.008-0.018, scale 0.55, wash
  0.60-0.85, DejaVu "font" render);
- **r3c** — the round-3 bimodal/glare regime (sigma 0.8-1.2, noise
  0.010-0.020, 30% localized glare blobs, plate-typography render);
- **gan** — the learned-degradation route (clean bilinear LR through the
  committed CycleGAN G_AtoB, reference my_utils/create_lr.py:45-90).

The HR pool is rendered half "font" / half "plate" style and the LR route is
drawn per sample, independent of render style, so the model sees the full
(render x degradation) cross.  Plate texts are DISJOINT from the eval sets'
seed-0 texts (same guarantee as tools/train_lpsr_synth.py).

Usage:
  python tools/train_lpsr_unified.py --out checkpoints/lpsr_unified \
      --init checkpoints/lpsr_synth/best_model.npz --epochs 400 \
      --pool 16384 --lr 5e-4
"""

from __future__ import annotations

import argparse
import json
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

from train_lpsr_synth import disjoint_texts


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="checkpoints/lpsr_unified")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--pool", type=int, default=16384)
    p.add_argument("--val", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=2,
                   help="train RNG seed; must differ from the eval sets' (0)")
    p.add_argument("--init", default="checkpoints/lpsr_synth/best_model.npz")
    p.add_argument("--gan-weights", default="checkpoints/demo_cyclegan_g.npz")
    p.add_argument("--p-gan", type=float, default=0.15,
                   help="per-sample probability of the learned-degradation "
                        "route (remaining mass splits evenly uniform/r3c)")
    p.add_argument("--real-gan-weights", default=None,
                   help="real-LR CycleGAN G (tools/train_cyclegan_real.py) "
                        "— the reference's 60%%-rate real-domain route "
                        "(my_utils/create_lr.py:45-90)")
    p.add_argument("--p-real-gan", type=float, default=0.0,
                   help="per-sample probability of the REAL-LR learned "
                        "route (applied before --p-gan)")
    p.add_argument("--p-invert", type=float, default=0.0,
                   help="per-sample probability of polarity inversion of "
                        "the LR input (white-on-dark plates, e.g. the CN "
                        "blue fixtures; target stays dark-on-light so the "
                        "model learns polarity NORMALIZATION)")
    p.add_argument("--kernels", default="/root/reference/estimated-kn")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    assert args.seed != 0, "train seed must differ from the eval sets'"
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image

    from make_eval_set import render_tight_plate
    from lpr_tpu.data.degradation import (DegradationConfig, LPDegradation,
                                          apply_estimated_kernel,
                                          load_estimated_kernels)
    from lpr_tpu.models.cyclegan import generator_apply, generator_init
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer
    from lpr_tpu.weights.checkpoint import load_params, save_params

    hr_hw, lr_hw = (64, 384), (32, 192)
    # uniform = make_eval_set CLI defaults; r3c = the committed round-3
    # headline regime (EVAL.md "Reproduce")
    deg_uniform = LPDegradation(DegradationConfig(
        gaussian_sigma_range=(0.6, 1.1), noise_level_range=(0.008, 0.018),
        scale=0.55, lr_hw=lr_hw), hr_hw=hr_hw)
    deg_r3c = LPDegradation(DegradationConfig(
        gaussian_sigma_range=(0.8, 1.2), noise_level_range=(0.010, 0.020),
        scale=0.55, lr_hw=lr_hw, p_glare=0.3,
        glare_radius_range=(0.35, 0.60), glare_alpha_range=(0.55, 0.95)),
        hr_hw=hr_hw)

    kernels = jnp.asarray(load_estimated_kernels(args.kernels))

    gan_params = None
    if args.gan_weights and os.path.exists(args.gan_weights):
        gan_params = load_params(args.gan_weights,
                                 generator_init(jax.random.PRNGKey(0)))
    else:
        print(f"# no GAN weights at {args.gan_weights}; gan route off",
              file=sys.stderr)

    real_gan_params = None
    if args.real_gan_weights and os.path.exists(args.real_gan_weights):
        real_gan_params = load_params(args.real_gan_weights,
                                      generator_init(jax.random.PRNGKey(0)))
    elif args.p_real_gan > 0:
        print(f"# no real-GAN weights at {args.real_gan_weights}; "
              f"real route off", file=sys.stderr)

    p_gan = args.p_gan if gan_params is not None else 0.0
    p_real = args.p_real_gan if real_gan_params is not None else 0.0
    p_inv = args.p_invert

    @jax.jit
    def make_lr(key, hr8, clean_lr8):
        """Per-sample regime mixture, entirely device-side (the axon tunnel
        makes per-batch host round-trips ~50x slower than the compute)."""
        hr = hr8.astype(jnp.float32) / 255.0
        b = hr.shape[0]
        ks = jax.random.split(key, 12)
        # estimated real-blur kernel gate (shared by both classical chains,
        # p=0.3 like the eval builders)
        blurred = jax.vmap(
            lambda k, im_: apply_estimated_kernel(k, im_, kernels)
        )(jax.random.split(ks[0], b), hr)
        gate = jax.random.uniform(ks[1], (b, 1, 1, 1)) < 0.3
        hr = jnp.where(gate, blurred, hr)
        lr_u = deg_uniform(ks[2], hr)
        lr_r = deg_r3c(ks[3], hr)
        route = jax.random.uniform(ks[4], (b, 1, 1, 1))
        lr = jnp.where(route < 0.5, lr_u, lr_r)
        # contrast wash (same range in both classical regimes)
        c = jax.random.uniform(ks[5], (b, 1, 1, 1), minval=0.60, maxval=0.85)
        m = jax.random.uniform(ks[6], (b, 1, 1, 1), minval=0.55, maxval=0.80)
        lr = jnp.clip(lr * c + (1 - c) * m, 0.0, 1.0)
        if p_gan > 0.0:
            clean = clean_lr8.astype(jnp.float32) / 255.0
            gan_lr = jnp.clip(
                generator_apply(gan_params, clean * 2.0 - 1.0) * 0.5 + 0.5,
                0.0, 1.0)
            g = jax.random.uniform(ks[7], (b, 1, 1, 1)) < p_gan
            lr = jnp.where(g, gan_lr, lr)
        if p_real > 0.0:
            # the real-LR learned route (reference create_lr.py:45-90
            # routes 60% of LR synthesis through its real-capture G)
            clean = clean_lr8.astype(jnp.float32) / 255.0
            real_lr = jnp.clip(
                generator_apply(real_gan_params, clean * 2.0 - 1.0) * 0.5
                + 0.5, 0.0, 1.0)
            g = jax.random.uniform(ks[8], (b, 1, 1, 1)) < p_real
            lr = jnp.where(g, real_lr, lr)
        if p_inv > 0.0:
            # polarity augmentation (round-5 item 3): invert the INPUT only
            # — the grayscale target stays dark-on-light, teaching the net
            # to polarity-normalize white-on-dark (CN-style) plates.  A
            # random channel cast moves the inverted background off neutral
            # gray toward colored (e.g. blue) backgrounds.
            # channel ranges biased toward the blue-background real domain
            # (measured CN fixture means: R 0.14-0.32, G 0.22-0.53,
            # B 0.31-0.74)
            cast = jax.random.uniform(
                ks[9], (b, 1, 1, 3),
                minval=jnp.asarray([0.30, 0.45, 0.70]),
                maxval=jnp.asarray([0.85, 0.95, 1.05]))
            inv = jnp.clip((1.0 - lr) * cast, 0.0, 1.0)
            g = jax.random.uniform(ks[10], (b, 1, 1, 1)) < p_inv
            lr = jnp.where(g, inv, lr)
        return lr

    # --- paired pool: HR renders (half font / half plate style), grayscale
    # targets, clean bilinear LR for the GAN route (all uint8, cached) ------
    n_total = args.pool + args.val
    cache = f"/tmp/lpsr_unified_pool_{args.seed}_{n_total}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        hrs, tgts, cleans = z["hrs"], z["tgts"], z["cleans"]
        print(f"loaded HR pool cache {cache}", file=sys.stderr)
    else:
        print(f"rendering {n_total} HR plates (font+plate styles, disjoint "
              f"from eval seed 0)...", file=sys.stderr)
        texts = disjoint_texts(n_total, args.seed)
        nprng = np.random.RandomState(args.seed)
        hrs = np.empty((n_total, *hr_hw, 3), np.uint8)
        tgts = np.empty((n_total, *lr_hw, 1), np.uint8)
        cleans = np.empty((n_total, *lr_hw, 3), np.uint8)
        for i, t in enumerate(texts):
            style = "font" if nprng.rand() < 0.5 else "plate"
            hr8 = render_tight_plate(t, nprng, *hr_hw, style=style)
            hrs[i] = hr8
            im = Image.fromarray(hr8).resize((lr_hw[1], lr_hw[0]),
                                             Image.BILINEAR)
            cleans[i] = np.asarray(im, np.uint8)
            # reference HR target: grayscale at LR size
            # (dataset/lpsr_dataset.py:26)
            tgts[i] = np.asarray(im.convert("L"), np.uint8)[..., None]
            if i % 1024 == 0:
                print(f"\r  {i}/{n_total}", end="", file=sys.stderr)
        print(file=sys.stderr)
        np.savez(cache, hrs=hrs, tgts=tgts, cleans=cleans)

    tr_hr = jax.device_put(hrs[: args.pool])
    tr_tg = jax.device_put(tgts[: args.pool])
    tr_cl = jax.device_put(cleans[: args.pool])
    va_hr = jax.device_put(hrs[args.pool:])
    va_tg = jax.device_put(tgts[args.pool:]).astype(jnp.float32) / 255.0
    va_cl = jax.device_put(cleans[args.pool:])

    key = jax.random.PRNGKey(args.seed)
    key, vkey = jax.random.split(key)
    va_lr = jnp.concatenate([
        make_lr(jax.random.fold_in(vkey, i), va_hr[s : s + args.batch],
                va_cl[s : s + args.batch])
        for i, s in enumerate(range(0, va_hr.shape[0], args.batch))
    ])

    take = jax.jit(lambda pool, idx: jnp.take(pool, idx, axis=0))
    to_f = jax.jit(lambda t8: t8.astype(jnp.float32) / 255.0)

    trainer = LPSRTrainer(LPSRTrainConfig(lr=args.lr), LPSRConfig())
    init_params = load_lpsr(args.init) if args.init else None
    if init_params is not None:
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
            lr_img = make_lr(bk, take(tr_hr, idx), take(tr_cl, idx))
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
