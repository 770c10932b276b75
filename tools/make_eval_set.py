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
                       h: int = 64, w: int = 384, font_path: str = FONT,
                       margin: float = 0.0,
                       style: str = "font") -> np.ndarray:
    """Tight one-row crop in VN plate layout: NNA-NNN.NN squeezed to fill
    the full width (like the real fixtures: 390x43 edge-to-edge text).

    ``margin`` adds plate-rim background around the text before the final
    resize (fraction of the tight width per side) — real detector crops
    carry the plate border, so characters never touch the crop edge.
    The default (0.0) reproduces the committed protocol sets byte-exactly.
    """
    from PIL import Image, ImageDraw, ImageFont

    txt = text[:3] + "-" + text[3:6] + "." + text[6:]
    bg = tuple(rng.randint(195, 230, 3))
    fg = tuple(rng.randint(25, 65, 3))
    if style == "plate":
        # Vietnamese plates use a DIN-like face whose "1" is a plain
        # vertical bar (see tests/fixtures/real_plates); DejaVu's serifed
        # "1" is the one glyph whose topology diverges enough to flip the
        # OCR class (1->4/1->A at clean-render resolution).  Drawing the
        # digit with DejaVu's bar glyph "I" restores the plate topology.
        txt = txt.replace("1", "I")
    font = ImageFont.truetype(font_path, int(h * 0.82))
    probe = ImageDraw.Draw(Image.new("RGB", (8, 8)))
    tw = probe.textlength(txt, font=font)
    tmp = Image.new("RGB", (int(tw) + 8, h), bg)
    d = ImageDraw.Draw(tmp)
    d.text((4, -h * 0.12), txt, fill=fg, font=font)
    if margin > 0.0:
        mx = int(tmp.width * margin)
        my = int(h * margin)
        framed = Image.new("RGB", (tmp.width + 2 * mx, h + 2 * my), bg)
        framed.paste(tmp, (mx, my))
        tmp = framed
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
    p.add_argument("--glare-p", type=float, default=0.0,
                   help="per-crop probability of a localized glare blob "
                        "(~one character; concentrated-damage mode)")
    p.add_argument("--glare-radius", type=float, nargs=2,
                   default=(0.35, 0.60))
    p.add_argument("--glare-alpha", type=float, nargs=2,
                   default=(0.55, 0.95))
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
    # Bimodal difficulty mixture.  The reference's real 1050-crop set is
    # bimodal in difficulty (its published raw/SR pairs are only consistent
    # with a large mild cohort SR can fully fix plus a severe tail — see
    # EVAL.md): --mix F draws F of the crops from a "mild" severity regime
    # and 1-F from the base (severe) regime above.  Cohort fractions and
    # severities are calibrated against the published RAW pair only
    # (acc 26.86 / CER 31.10, reference README.md:244-245); SR deltas are
    # then a prediction, not a fit.
    p.add_argument("--mix", type=float, default=None,
                   help="fraction of crops drawn from the mild regime")
    p.add_argument("--mild-sigma", type=float, nargs=2, default=(0.4, 0.7))
    p.add_argument("--mild-noise", type=float, nargs=2,
                   default=(0.004, 0.010))
    p.add_argument("--mild-scale", type=float, default=0.75)
    p.add_argument("--mild-wash", type=float, nargs=2, default=(0.80, 0.95))
    p.add_argument("--cohort", default=None, choices=[None, "mild", "severe"],
                   help="with --mix: generate only one cohort (calibration "
                        "probes); default generates both into --out")
    p.add_argument("--render-margin", type=float, default=0.0,
                   help="plate-rim margin around the text (fraction per "
                        "side); 0.0 = committed-protocol tight render")
    p.add_argument("--render-font", default=FONT)
    p.add_argument("--render-style", default="font",
                   choices=["font", "plate"],
                   help="plate = DejaVu with the '1' drawn as the bar "
                        "glyph (real VN plate topology); font = the "
                        "committed-protocol round-2 render")
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
        p_glare=args.glare_p,
        glare_radius_range=tuple(args.glare_radius),
        glare_alpha_range=tuple(args.glare_alpha),
    )
    deg = LPDegradation(cfg, hr_hw=hr_hw)
    deg_mild = None
    if args.mix is not None:
        cfg_mild = DegradationConfig(
            gaussian_sigma_range=tuple(args.mild_sigma),
            noise_level_range=tuple(args.mild_noise),
            scale=args.mild_scale, lr_hw=(32, 192),
        )
        deg_mild = LPDegradation(cfg_mild, hr_hw=hr_hw)

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

    def run_cohort(cohort_texts, deg_c, wash_c, nprng_c, key_c):
        for s in range(0, len(cohort_texts), args.batch):
            chunk = cohort_texts[s : s + args.batch]
            hrs = np.stack([
                render_tight_plate(
                    t, nprng_c, *hr_hw, font_path=args.render_font,
                    margin=args.render_margin, style=args.render_style,
                ).astype(np.float32) / 255.0
                for t in chunk
            ])
            hr = jnp.asarray(hrs)
            key_c, k1, k2, k3 = jax.random.split(key_c, 4)
            if kernels is not None:
                blurred = est(jax.random.split(k1, hr.shape[0]), hr)
                gate = (jax.random.uniform(k2, (hr.shape[0], 1, 1, 1))
                        < args.p_estimated)
                hr = jnp.where(gate, blurred, hr)
            lr = np.asarray(deg_c(k3, hr))
            # contrast wash toward the faded look of real LR captures
            b = len(chunk)
            c = nprng_c.uniform(*wash_c, (b, 1, 1, 1)).astype(np.float32)
            m = nprng_c.uniform(0.55, 0.8, (b, 1, 1, 1)).astype(np.float32)
            lr = np.clip(lr * c + (1 - c) * m, 0.0, 1.0)
            if gan_apply is not None:
                # learned-degradation route (reference create_lr.py:45-90: a
                # fraction of crops goes through G_AtoB instead of the
                # classical chain).  G runs at its training domain (the LR
                # crop size); its output already carries the learned wash,
                # so no extra one.
                clean_lr = jnp.asarray(np.stack([
                    np.asarray(Image.fromarray(
                        (im * 255).astype(np.uint8)).resize(
                            (cfg.lr_hw[1], cfg.lr_hw[0]), Image.BILINEAR),
                        np.float32) / 255.0
                    for im in hrs
                ]))
                gan_lr = np.asarray(gan_apply(gan_params, clean_lr))
                routes = nprng_c.rand(b)
                lr = np.where((routes <= args.p_gan)[:, None, None, None],
                              gan_lr, lr)
            for t, img in zip(chunk, lr):
                Image.fromarray(
                    np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
                ).save(os.path.join(args.out, f"{t}.png"))
            print(f"\r{min(s + args.batch, len(cohort_texts))}"
                  f"/{len(cohort_texts)}", end="", file=sys.stderr)
        print(file=sys.stderr)

    if args.mix is None:
        run_cohort(texts, deg, args.wash, nprng, key)
    else:
        # Deterministic cohort split; separate RNG streams per cohort so a
        # single-cohort probe (--cohort) reproduces that cohort's images
        # exactly.
        n_mild = int(round(args.mix * args.n))
        mild_texts, severe_texts = texts[:n_mild], texts[n_mild:]
        if args.cohort in (None, "mild") and mild_texts:
            run_cohort(mild_texts, deg_mild, args.mild_wash,
                       np.random.RandomState(args.seed + 101),
                       jax.random.PRNGKey(args.seed + 101))
        if args.cohort in (None, "severe") and severe_texts:
            run_cohort(severe_texts, deg, args.wash,
                       np.random.RandomState(args.seed + 202),
                       jax.random.PRNGKey(args.seed + 202))
    print(f"wrote {args.n} LR crops to {args.out}")


if __name__ == "__main__":
    main()
