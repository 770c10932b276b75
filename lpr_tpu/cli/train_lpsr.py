"""LPSR training CLI — counterpart of reference ``train/lpsr.py:204-218``."""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train LPSR (TPU)")
    p.add_argument("--hr-train-dir", required=True)
    p.add_argument("--lr-train-dir", required=True)
    p.add_argument("--hr-val-dir", required=True)
    p.add_argument("--lr-val-dir", required=True)
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--ckpt-dir", default="checkpoints/lpsr")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all local devices")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from lpr_tpu.data.datasets import PairedImageDataset
    from lpr_tpu.models.lpsr import LPSRConfig
    from lpr_tpu.parallel.mesh import make_mesh
    from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer

    hw = (args.height, args.width)
    train_ds = PairedImageDataset(args.hr_train_dir, args.lr_train_dir, hw)
    val_ds = PairedImageDataset(args.hr_val_dir, args.lr_val_dir, hw)
    print(f"train {len(train_ds)} pairs, val {len(val_ds)} pairs")

    mesh = make_mesh() if args.data_parallel else None
    trainer = LPSRTrainer(LPSRTrainConfig(lr=args.lr), LPSRConfig(), mesh=mesh)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    epoch_counter = [0]

    def train_batches():
        epoch_counter[0] += 1
        return train_ds.batches(args.batch_size, shuffle=True,
                                seed=epoch_counter[0], drop_last=True)

    def val_batches():
        return val_ds.batches(args.batch_size, shuffle=False, drop_last=True)

    state = trainer.fit(train_batches, val_batches, args.epochs,
                        ckpt_dir=args.ckpt_dir)
    print("done; best PSNR", state["best_psnr"])


if __name__ == "__main__":
    main()
