"""Batch super-resolution CLI — counterpart of reference ``inference/sr.py``.

folder in -> folder out.  ``--model lpsr`` runs the LPSR enhancer ([0,1]
in/out, the intended path); ``--model cyclegan`` runs a CycleGAN generator
with [-1,1] normalization like the reference script actually does
(inference/sr.py:35,58,95-96 loads a Generator despite its name).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Batch plate SR (TPU)")
    p.add_argument("--weights", required=True)
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--model", choices=["lpsr", "cyclegan"], default="lpsr")
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--batch", type=int, default=64)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    files = sorted(
        f for f in os.listdir(args.input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    os.makedirs(args.output_dir, exist_ok=True)

    if args.model == "lpsr":
        from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply

        cfg = LPSRConfig()
        params = load_lpsr(args.weights, cfg)
        fn = jax.jit(lambda p, x: lpsr_apply(p, x, cfg))
        pre = lambda x: x
        post = lambda y: y
    else:
        from lpr_tpu.models.cyclegan import generator_apply
        from lpr_tpu.weights.torch_ckpt import load_state_dict
        from lpr_tpu.models.cyclegan import generator_from_torch

        params = generator_from_torch(load_state_dict(args.weights))
        fn = jax.jit(generator_apply)
        pre = lambda x: x * 2.0 - 1.0        # reference sr.py:35
        post = lambda y: y * 0.5 + 0.5       # reference sr.py:58

    for s in range(0, len(files), args.batch):
        chunk = files[s : s + args.batch]
        imgs = []
        for f in chunk:
            img = Image.open(os.path.join(args.input_dir, f)).convert("RGB")
            img = img.resize((args.width, args.height), Image.BICUBIC)
            imgs.append(np.asarray(img, np.float32) / 255.0)
        x = pre(jnp.asarray(np.stack(imgs)))
        y = np.asarray(post(fn(params, x)))
        for f, out in zip(chunk, y):
            out = np.clip(out, 0, 1)
            if out.shape[-1] == 1:
                out = np.repeat(out, 3, -1)
            Image.fromarray((out * 255).astype(np.uint8)).save(
                os.path.join(args.output_dir, f)
            )
        print(f"{min(s + args.batch, len(files))}/{len(files)}")


if __name__ == "__main__":
    main()
