"""CycleGAN training CLI — counterpart of reference ``train/cyclegans.py:199-226``."""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train degradation CycleGAN (TPU)")
    p.add_argument("--dataroot", required=True,
                   help="folder with trainA/ (HR) and trainB/ (LR)")
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--ckpt-dir", default="checkpoints/cyclegan")
    p.add_argument("--ckpt-every", type=int, default=50)  # reference :188
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lpr_tpu.data.datasets import UnpairedImageDataset
    from lpr_tpu.train.cyclegan import CycleGANConfig, CycleGANTrainer
    from lpr_tpu.weights.checkpoint import save_params

    ds = UnpairedImageDataset(args.dataroot, (args.height, args.width))
    trainer = CycleGANTrainer(CycleGANConfig(lr=args.lr))
    state = trainer.init(jax.random.PRNGKey(0))
    os.makedirs(args.ckpt_dir, exist_ok=True)

    for epoch in range(args.epochs):
        metrics = None
        for a, b in ds.batches(args.batch_size):
            if a.shape[0] < args.batch_size:
                continue
            state, metrics = trainer.step(state, jnp.asarray(a), jnp.asarray(b))
        if metrics:
            print(f"epoch {epoch}: G {metrics['g_loss']:.4f} "
                  f"(id {metrics['id']:.3f} gan {metrics['gan']:.3f} "
                  f"cyc {metrics['cyc']:.3f}) "
                  f"D_A {metrics['d_a_loss']:.4f} D_B {metrics['d_b_loss']:.4f}")
        if (epoch + 1) % args.ckpt_every == 0:
            save_params(f"{args.ckpt_dir}/netG_AtoB_epoch_{epoch+1}.npz",
                        state["g"]["ab"])
            save_params(f"{args.ckpt_dir}/netG_BtoA_epoch_{epoch+1}.npz",
                        state["g"]["ba"])
    print("done")


if __name__ == "__main__":
    main()
