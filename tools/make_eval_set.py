"""Generate a protocol-scale LR plate evaluation set.

The reference's published headline (README.md:240-245) is measured on 1050
real low-resolution plate crops with OCR conf 0.5; that set is not shipped.
This tool synthesizes an equivalent-scale set calibrated to the same
difficulty regime:

- plates rendered as TIGHT crops in the Vietnamese layout
  (``NNA-NNN.NN`` separators, text squeezed to fill the full crop — matches
  the shipped real fixtures in tests/fixtures/real_plates);
- degraded on-device through the framework's classical degradation model
  (``lpr_tpu/data/degradation.py``, the reference's my_models/degradation.py)
  plus the shipped estimated real-world blur kernels
  (``/root/reference/estimated-kn/*.mat``, my_utils/utils.py:162-174);
- contrast-washed toward the faded look of real LR captures (without this,
  the raw OCR over-performs and SR under-performs vs the published regime).

Defaults land raw OCR CER ~31% (reference: 31.10%).  Saved as
``{TEXT}.png`` so ``cli/evaluate.py`` consumes it with the reference's
filename-GT protocol.  Deterministic per --seed.

Usage: python tools/make_eval_set.py --out /path [--n 1050] [--platform cpu]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf"


def render_tight_plate(text: str, rng: np.random.RandomState,
                       h: int = 64, w: int = 384) -> np.ndarray:
    """Tight one-row crop in VN plate layout: NNA-NNN.NN squeezed to fill
    the full width (like the real fixtures: 390x43 edge-to-edge text)."""
    from PIL import Image, ImageDraw, ImageFont

    txt = text[:3] + "-" + text[3:6] + "." + text[6:]
    font = ImageFont.truetype(FONT, int(h * 0.82))
    probe = ImageDraw.Draw(Image.new("RGB", (8, 8)))
    tw = probe.textlength(txt, font=font)
    tmp = Image.new("RGB", (int(tw) + 8, h), tuple(rng.randint(195, 230, 3)))
    d = ImageDraw.Draw(tmp)
    d.text((4, -h * 0.12), txt, fill=tuple(rng.randint(25, 65, 3)), font=font)
    return np.asarray(tmp.resize((w, h), Image.BILINEAR), np.uint8)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=1050)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--sigma", type=float, nargs=2, default=(0.6, 1.1))
    p.add_argument("--noise", type=float, nargs=2, default=(0.008, 0.018))
    p.add_argument("--scale", type=float, default=0.55,
                   help="downscale factor before re-upscale (smaller = harder)")
    p.add_argument("--wash", type=float, nargs=2, default=(0.6, 0.85),
                   help="contrast retention range (1.0 = no wash)")
    p.add_argument("--p-estimated", type=float, default=0.3,
                   help="probability of an estimated real-blur kernel pass")
    p.add_argument("--kernels", default="/root/reference/estimated-kn")
    p.add_argument("--gan-weights", type=str, default=None,
                   help="CycleGAN G_AtoB weights (.npz): route a fraction "
                        "of crops through the learned degradation, like the "
                        "reference LR generator (my_utils/create_lr.py:45-90)")
    p.add_argument("--p-gan", type=float, default=0.4,
                   help="per-crop probability of the GAN route when "
                        "--gan-weights is given (reference: p<=0.4)")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image

    from lpr_tpu.data.degradation import (DegradationConfig, LPDegradation,
                                          apply_estimated_kernel,
                                          load_estimated_kernels)
    from synth_plates import random_plate_text

    hr_hw = (64, 384)
    cfg = DegradationConfig(
        gaussian_sigma_range=tuple(args.sigma),
        noise_level_range=tuple(args.noise),
        scale=args.scale, lr_hw=(32, 192),
    )
    deg = LPDegradation(cfg, hr_hw=hr_hw)

    kernels = None
    if args.p_estimated > 0 and os.path.isdir(args.kernels):
        try:
            kernels = jnp.asarray(load_estimated_kernels(args.kernels))
            if kernels.shape[0] == 0:
                kernels = None
        except Exception as e:  # scipy missing etc.
            print(f"# estimated kernels unavailable: {e}", file=sys.stderr)
    if kernels is not None:
        est = jax.jit(jax.vmap(
            lambda k, im_: apply_estimated_kernel(k, im_, kernels)))

    gan_apply = gan_params = None
    if args.gan_weights:
        from lpr_tpu.models.cyclegan import generator_apply, generator_init
        from lpr_tpu.weights.checkpoint import load_params

        gan_params = load_params(args.gan_weights,
                                 generator_init(jax.random.PRNGKey(0)))
        gan_apply = jax.jit(lambda p_, x_: jnp.clip(
            generator_apply(p_, x_ * 2.0 - 1.0) * 0.5 + 0.5, 0.0, 1.0))

    rng = random.Random(args.seed)
    nprng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out, exist_ok=True)

    texts, seen = [], set()
    while len(texts) < args.n:
        t = random_plate_text(rng, two_row=False)
        if t not in seen:
            seen.add(t)
            texts.append(t)

    for s in range(0, args.n, args.batch):
        chunk = texts[s : s + args.batch]
        hrs = np.stack([
            render_tight_plate(t, nprng, *hr_hw).astype(np.float32) / 255.0
            for t in chunk
        ])
        hr = jnp.asarray(hrs)
        key, k1, k2, k3 = jax.random.split(key, 4)
        if kernels is not None:
            blurred = est(jax.random.split(k1, hr.shape[0]), hr)
            gate = (jax.random.uniform(k2, (hr.shape[0], 1, 1, 1))
                    < args.p_estimated)
            hr = jnp.where(gate, blurred, hr)
        lr = np.asarray(deg(k3, hr))
        # contrast wash toward the faded look of real LR captures
        b = len(chunk)
        c = nprng.uniform(*args.wash, (b, 1, 1, 1)).astype(np.float32)
        m = nprng.uniform(0.55, 0.8, (b, 1, 1, 1)).astype(np.float32)
        lr = np.clip(lr * c + (1 - c) * m, 0.0, 1.0)
        if gan_apply is not None:
            # learned-degradation route (reference create_lr.py:45-90: a
            # fraction of crops goes through G_AtoB instead of the classical
            # chain).  G runs at its training domain (the LR crop size);
            # its output already carries the learned wash, so no extra one.
            clean_lr = jnp.asarray(np.stack([
                np.asarray(Image.fromarray(
                    (im * 255).astype(np.uint8)).resize(
                        (cfg.lr_hw[1], cfg.lr_hw[0]), Image.BILINEAR),
                    np.float32) / 255.0
                for im in hrs
            ]))
            gan_lr = np.asarray(gan_apply(gan_params, clean_lr))
            routes = nprng.rand(b)
            lr = np.where((routes <= args.p_gan)[:, None, None, None],
                          gan_lr, lr)
        for t, img in zip(chunk, lr):
            Image.fromarray(
                np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
            ).save(os.path.join(args.out, f"{t}.png"))
        print(f"\r{min(s + args.batch, args.n)}/{args.n}", end="",
              file=sys.stderr)
    print(file=sys.stderr)
    print(f"wrote {args.n} LR crops to {args.out}")


if __name__ == "__main__":
    main()
