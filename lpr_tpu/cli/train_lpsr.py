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
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint .npz to warm-start from")
    p.add_argument("--resume-run", action="store_true",
                   help="warm-start from the newest registry run's 'latest' "
                        "checkpoint and record it as this run's parent "
                        "(the reference's W&B resume-from-artifact flow, "
                        "yolov5/utils/loggers/wandb/wandb_utils.py)")
    p.add_argument("--runs-dir", default="runs",
                   help="run-artifact registry root (lpr_tpu.utils.registry)")
    p.add_argument("--run-project", default="lpsr")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all local devices; multi-process "
                        "(multi-host) when COORDINATOR_ADDRESS/WORLD_SIZE/"
                        "RANK are set — the reference's DDP env contract "
                        "(yolov5/train.py:60-62)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from lpr_tpu.parallel.multiproc import initialize_from_env, is_main_process

    dist = initialize_from_env()
    import jax

    from lpr_tpu.data.datasets import PairedImageDataset
    from lpr_tpu.models.lpsr import LPSRConfig
    from lpr_tpu.parallel.mesh import make_mesh
    from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer

    hw = (args.height, args.width)
    train_ds = PairedImageDataset(args.hr_train_dir, args.lr_train_dir, hw)
    val_ds = PairedImageDataset(args.hr_val_dir, args.lr_val_dir, hw)

    batch_size = args.batch_size
    if dist:
        # --batch-size is the GLOBAL batch (the reference divides its total
        # batch by WORLD_SIZE the same way, yolov5/train.py:135).  Each rank
        # takes a strided subset of the pairs, truncated so every rank sees
        # the same number of steps (the collective train step would deadlock
        # otherwise).
        w, r = jax.process_count(), jax.process_index()
        if args.batch_size % w:
            raise SystemExit(f"--batch-size {args.batch_size} not divisible "
                             f"by WORLD_SIZE {w}")
        batch_size = args.batch_size // w
        for ds in (train_ds, val_ds):
            n = len(ds.pairs) - (len(ds.pairs) % w)
            ds.pairs = ds.pairs[:n][r::w]
        mesh = make_mesh()
    else:
        mesh = make_mesh() if args.data_parallel else None
    main_proc = is_main_process() if dist else True
    if main_proc:
        print(f"train {len(train_ds)} pairs/rank, val {len(val_ds)} "
              f"pairs/rank" + (f" x {jax.process_count()} ranks" if dist else ""))

    lpsr_cfg = LPSRConfig()
    trainer = LPSRTrainer(LPSRTrainConfig(lr=args.lr), lpsr_cfg, mesh=mesh)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    # run-artifact registry: config + dataset fingerprint + ckpt lineage
    run = parent = None
    resume_path = args.resume
    data_dirs = [args.hr_train_dir, args.lr_train_dir,
                 args.hr_val_dir, args.lr_val_dir]
    from lpr_tpu.utils.registry import RunRegistry

    registry = RunRegistry(args.runs_dir)
    if args.resume_run:
        # resolved on EVERY rank (read-only): replicate() requires each
        # process to warm-start from the same value, and a missing prior
        # run must fail all ranks rather than leave rank 0 exiting while
        # the others hang in the first collective.  Assumes the runs dir
        # is on a shared filesystem, like the checkpoints themselves.
        # Resolution keys on the newest run WITH a 'latest' checkpoint —
        # never on bare directory order — so a rank that arrives after
        # rank 0 has already opened the new (artifact-less) run resolves
        # the same parent and the same warm-start path as every other
        # rank (no silent cross-rank divergence).
        parent = registry.latest(args.run_project, with_artifact="latest")
        if parent is None:
            raise SystemExit(f"--resume-run: no prior runs under "
                             f"{args.runs_dir}/{args.run_project}")
        if resume_path is None:
            resume_path = registry.resume_checkpoint(args.run_project)
    if main_proc:
        # the registry WRITE stays rank-0-only so concurrent ranks don't
        # race on run-id allocation
        run = registry.new_run(args.run_project, config=vars(args),
                               dataset_dirs=data_dirs, resume_from=parent)
        print(f"run {run.id} (dataset {run.manifest['dataset_fingerprint']})")

    init_params = None
    if resume_path:
        from lpr_tpu.models.lpsr import lpsr_init
        from lpr_tpu.weights.checkpoint import load_params

        init_params = load_params(
            resume_path, lpsr_init(jax.random.PRNGKey(0), lpsr_cfg))
        if main_proc:
            print(f"resumed weights from {resume_path}")

    epoch_counter = [0]

    def train_batches():
        epoch_counter[0] += 1
        return train_ds.batches(batch_size, shuffle=True,
                                seed=epoch_counter[0], drop_last=True)

    def val_batches():
        return val_ds.batches(batch_size, shuffle=False, drop_last=True)

    state = trainer.fit(train_batches, val_batches, args.epochs,
                        ckpt_dir=args.ckpt_dir if main_proc else None,
                        logger=print if main_proc else (lambda *a, **k: None),
                        init_params=init_params)
    if main_proc:
        best_psnr = float(state["best_psnr"])
        if run is not None:
            for fname, aliases in (("last_model.npz", ("latest",)),
                                   ("best_model.npz", ("best",))):
                p = os.path.join(args.ckpt_dir, fname)
                if os.path.exists(p):
                    run.log_artifact(p, aliases=aliases,
                                     metrics={"best_psnr": best_psnr})
            run.finish({"best_psnr": best_psnr, "epochs": args.epochs})
        print("done; best PSNR", state["best_psnr"])


if __name__ == "__main__":
    main()
