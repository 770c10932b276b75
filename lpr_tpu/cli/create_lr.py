"""LR training-data generator CLI — counterpart of reference
``my_utils/create_lr.py:45-90``.

Per HR image, pick a degradation route by probability p ~ U(0,1):
p <= 0.4 -> CycleGAN G_AtoB only; 0.4 < p <= 0.8 -> classical degradation
only; p > 0.8 -> CycleGAN followed by classical (hybrid).  Runs batched on
device.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Synthesize LR training data")
    p.add_argument("--hr-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--gan-weights", type=str, default=None,
                   help="G_AtoB weights (.npz native or torch .pth); "
                        "classical-only if omitted")
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lpr_tpu.data.degradation import DegradationConfig, LPDegradation

    gan_apply = None
    gan_params = None
    if args.gan_weights:
        from lpr_tpu.models.cyclegan import generator_apply, generator_from_torch
        from lpr_tpu.weights.torch_ckpt import load_state_dict

        if args.gan_weights.endswith(".npz"):
            from lpr_tpu.models.cyclegan import generator_init
            from lpr_tpu.weights.checkpoint import load_params

            gan_params = load_params(
                args.gan_weights, generator_init(jax.random.PRNGKey(0))
            )
        else:
            gan_params = generator_from_torch(load_state_dict(args.gan_weights))
        gan_apply = jax.jit(generator_apply)

    files = sorted(
        f for f in os.listdir(args.hr_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    os.makedirs(args.out_dir, exist_ok=True)
    hw = (args.height * 2, args.width * 2)  # degrade from 2x resolution
    deg = LPDegradation(DegradationConfig(lr_hw=(args.height, args.width)),
                        hr_hw=hw)
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    for s in range(0, len(files), args.batch):
        chunk = files[s : s + args.batch]
        hrs = []
        for f in chunk:
            img = Image.open(os.path.join(args.hr_dir, f)).convert("RGB")
            img = img.resize((hw[1], hw[0]), Image.BICUBIC)
            hrs.append(np.asarray(img, np.float32) / 255.0)
        hr = jnp.asarray(np.stack(hrs))
        routes = rng.rand(len(chunk))

        gan_out = None
        if gan_apply is not None:
            gan_out = np.asarray(
                gan_apply(gan_params, hr * 2.0 - 1.0) * 0.5 + 0.5
            )
        key, sub = jax.random.split(key)
        cls_in = hr if gan_out is None else jnp.asarray(
            np.where((routes > 0.8)[:, None, None, None], gan_out,
                     np.asarray(hr))
        )
        cls_out = np.asarray(deg(sub, cls_in))

        for i, f in enumerate(chunk):
            p = routes[i]
            if gan_out is not None and p <= 0.4:
                out = np.asarray(Image.fromarray(
                    (np.clip(gan_out[i], 0, 1) * 255).astype(np.uint8)
                ).resize((args.width, args.height), Image.BILINEAR),
                    np.float32) / 255.0
            else:  # classical or hybrid (hybrid already routed through GAN)
                out = cls_out[i]
            Image.fromarray(
                (np.clip(out, 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(args.out_dir, f))
        print(f"{min(s + args.batch, len(files))}/{len(files)}")


if __name__ == "__main__":
    main()
