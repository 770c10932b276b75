"""YOLO detector training CLI (reference ``yolov5/train.py`` shell).

Dataset layout: ``--img-dir`` with images, ``--label-dir`` with YOLO-format
.txt labels (same stems).  Supports the two production architectures
(``--arch yolov5n/s/m/l/x`` or ``--arch char_ocr``) and data parallelism
over all local devices.
"""

from __future__ import annotations

import argparse
import os

# persistent XLA compile cache: chunked runs (scripts/train_det_chunked.sh,
# the axon-leak workaround) restart the process every few epochs — without
# this every chunk pays the full remote compile again
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a YOLO detector (TPU)")
    p.add_argument("--img-dir", required=True)
    p.add_argument("--label-dir", default=None)
    p.add_argument("--val-img-dir", default=None)
    p.add_argument("--val-label-dir", default=None)
    p.add_argument("--arch", default="yolov5s")
    p.add_argument("--nc", type=int, required=True)
    p.add_argument("--imgsz", type=int, nargs="+", default=[640],
                   help="square size, or 'H W' for rectangular training/val "
                        "(the reference serves its plate detector at rect "
                        "736x1280, onnx_models/detection/config.pbtxt:8-10)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr0", type=float, default=0.01)
    p.add_argument("--max-labels", type=int, default=64)
    p.add_argument("--ckpt-dir", default="checkpoints/yolo")
    p.add_argument("--init-weights", default=None,
                   help="warm-start from an .npz checkpoint (the reference's "
                        "--weights fine-tune path, train.py:117-130); "
                        "shape-compatible across input geometry (fully-conv)")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--workers", type=int, default=8,
                   help="loader threads (0 = synchronous)")
    p.add_argument("--cache", action="store_true",
                   help="decode images into RAM once (reference --cache ram, "
                        "datasets.py:484-507)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all local devices; multi-process "
                        "(multi-host) when COORDINATOR_ADDRESS/WORLD_SIZE/"
                        "RANK are set — the reference's DDP env contract "
                        "(yolov5/train.py:60-62)")
    p.add_argument("--autoanchor", action="store_true",
                   help="evolve anchors from the train labels first")
    p.add_argument("--evolve", type=int, default=0, metavar="N",
                   help="genetic hyperparameter evolution: N generations of "
                        "--epochs-long trainings, keep-by-fitness (reference "
                        "train.py:538-620); writes evolve.csv + "
                        "hyp_evolve.yaml to --ckpt-dir, then trains the "
                        "final model with the winning hyps")
    p.add_argument("--evolve-seed", type=int, default=0)
    p.add_argument("--hyp", action="append", default=[], metavar="K=V",
                   help="override a hyperparameter gene by name (the "
                        "reference's --hyp yaml surface, train.py:70; e.g. "
                        "--hyp obj=1.5 --hyp scale=0.3); repeatable")
    p.add_argument("--runs-dir", default="runs",
                   help="run-artifact registry root (lpr_tpu.utils.registry)")
    p.add_argument("--run-project", default="yolo")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from lpr_tpu.parallel.multiproc import initialize_from_env, is_main_process

    dist = initialize_from_env()
    import numpy as np

    from lpr_tpu.data.yolo_data import YoloDataset
    from lpr_tpu.models.yolo import build_yolo, char_ocr_spec, yolov5_spec, _SIZE_PRESETS
    from lpr_tpu.parallel.mesh import make_mesh
    from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer, fit_yolo
    from lpr_tpu.utils.loggers import Loggers

    if len(args.imgsz) not in (1, 2):
        raise SystemExit("--imgsz takes one int (square) or two (H W)")
    hw = tuple(args.imgsz * 2)[:2] if len(args.imgsz) == 1 \
        else tuple(args.imgsz)
    train_ds = YoloDataset(args.img_dir, args.label_dir, hw,
                           max_labels=args.max_labels,
                           augment=not args.no_augment,
                           cache_images=args.cache)
    val_ds = YoloDataset(args.val_img_dir or args.img_dir,
                         args.val_label_dir or args.label_dir, hw,
                         max_labels=args.max_labels, augment=False,
                         cache_images=args.cache)
    print(f"train {len(train_ds)} images, val {len(val_ds)} images")
    if args.cache:
        gb = train_ds.cache_all()
        print(f"cached {gb:.2f} GB of decoded images in RAM")

    ckpt_anchors = None
    if args.arch == "char_ocr":
        spec = char_ocr_spec()
        spec = type(spec)(**{**spec.__dict__, "nc": args.nc})
        strides = (8,)
        ckpt_anchors = np.ones((1, 2, 2), np.float32) * 2
    else:
        size = args.arch.replace("yolov5", "") or "s"
        depth, width = _SIZE_PRESETS[size]
        spec = yolov5_spec(nc=args.nc, depth=depth, width=width)
        strides = (8, 16, 32)

    if args.autoanchor:
        from lpr_tpu.utils.autoanchor import kmeans_anchors

        whs = []
        for i in range(min(len(train_ds), 500)):
            _, labels = train_ds.get(i)
            v = labels[labels[:, 3] > 0]
            whs.append(v[:, 3:5] * np.asarray([hw[1], hw[0]], np.float32))
        wh = np.concatenate(whs) if whs else np.zeros((0, 2))
        if len(wh) >= 8:
            n_anchors = 2 if args.arch == "char_ocr" else 9
            evolved = kmeans_anchors(wh, n=n_anchors)
            nl = len(strides)
            per = n_anchors // nl
            ckpt_anchors = (evolved.reshape(nl, per, 2)
                            / np.asarray(strides, np.float32)[:, None, None])
            print("evolved anchors (grid units):", ckpt_anchors.tolist())

    model = build_yolo(spec, ckpt_anchors=ckpt_anchors, strides=strides)

    # one flat hyp vector covering aug + loss + optimizer genes — the
    # reference's hyp.yaml contract (train.py:70, data/hyps/*.yaml); the
    # no-evolve path trains with exactly these defaults
    from lpr_tpu.data.yolo_data import YoloAugConfig
    from lpr_tpu.train.yolo_loss import YoloLossConfig

    hyp = {
        "lr0": args.lr0, "lrf": 0.01, "momentum": 0.937,
        "weight_decay": 5e-4, "warmup_epochs": 3.0, "warmup_momentum": 0.8,
        "warmup_bias_lr": 0.1, "box": 0.05, "cls": 0.5, "cls_pw": 1.0,
        "obj": 1.0, "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
        "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0,
        "translate": 0.1, "scale": 0.5, "shear": 0.0, "perspective": 0.0,
        "flipud": 0.0, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.0,
        "copy_paste": 0.0,
    }
    for kv in args.hyp:
        k, _, v = kv.partition("=")
        if k not in hyp:
            raise SystemExit(f"--hyp: unknown key {k!r} (valid: "
                             f"{sorted(hyp)})")
        hyp[k] = float(v)

    def make_cfgs(h):
        aug = YoloAugConfig(
            hsv_h=h["hsv_h"], hsv_s=h["hsv_s"], hsv_v=h["hsv_v"],
            degrees=h["degrees"], translate=h["translate"], scale=h["scale"],
            shear=h["shear"], perspective=h["perspective"],
            flipud=h["flipud"], fliplr=h["fliplr"], mosaic=h["mosaic"],
            mixup=h["mixup"], copy_paste=h["copy_paste"],
        )
        loss = YoloLossConfig(
            box=h["box"], obj=h["obj"], cls=h["cls"], cls_pw=h["cls_pw"],
            obj_pw=h["obj_pw"], anchor_t=h["anchor_t"],
        )
        tcfg = YoloTrainConfig(
            lr0=h["lr0"], lrf=h["lrf"], momentum=h["momentum"],
            weight_decay=h["weight_decay"], warmup_epochs=h["warmup_epochs"],
            warmup_momentum=h["warmup_momentum"],
            warmup_bias_lr=h["warmup_bias_lr"], epochs=args.epochs,
        )
        return aug, loss, tcfg

    batch_size = args.batch_size
    if dist:
        # --batch-size is the GLOBAL batch; each rank trains a strided,
        # equal-length subset (the reference's DistributedSampler split —
        # safe after cache_all/autoanchor because the RAM cache is keyed by
        # path, not index) and validates the full set redundantly (see
        # fit_yolo) so early-stop decisions stay rank-consistent.
        import jax

        w, r = jax.process_count(), jax.process_index()
        if args.batch_size % w:
            raise SystemExit(f"--batch-size {args.batch_size} not divisible "
                             f"by WORLD_SIZE {w}")
        batch_size = args.batch_size // w
        n = len(train_ds.paths) - (len(train_ds.paths) % w)
        train_ds.paths = train_ds.paths[:n][r::w]
        mesh = make_mesh()
    else:
        mesh = make_mesh() if args.data_parallel else None
    main_proc = is_main_process() if dist else True
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    init_params = None
    if args.init_weights:
        from lpr_tpu.weights.checkpoint import load_params

        import jax

        init_params = load_params(args.init_weights,
                                  model.init(jax.random.PRNGKey(0)))
        print(f"warm-started from {args.init_weights}")

    if args.evolve:
        from lpr_tpu.train.yolo import fitness, validate_map
        from lpr_tpu.utils.evolve import evolve

        def train_and_eval(cand):
            aug_cfg, loss_cfg, tcfg = make_cfgs(cand)
            train_ds.aug = aug_cfg
            t = YoloTrainer(model, tcfg, loss_cfg=loss_cfg,
                            steps_per_epoch=steps_per_epoch, mesh=mesh)
            state = fit_yolo(
                t, lambda: train_ds.batches(batch_size,
                                            workers=args.workers),
                lambda: val_ds.batches(batch_size, shuffle=False,
                                       workers=args.workers),
                epochs=args.epochs, ckpt_dir=None, patience=args.patience,
                logger=lambda m: None, init_params=init_params,
            )
            ema = state["ema"]
            if dist:
                # same guard as fit_yolo: validate_map's plain jit runs
                # per-process on local devices — fetch the replicated EMA
                # off the global mesh first.  Seeded mutation + redundant
                # full-set validation keep every rank's GA in lockstep.
                import jax

                ema = jax.device_get(ema)
            metrics = validate_map(
                model, ema,
                val_ds.batches(batch_size, shuffle=False,
                               workers=args.workers))
            fit = fitness(metrics)
            print(f"  candidate fitness {fit:.4f} "
                  f"(mAP50 {metrics['map50']:.4f} mAP {metrics['map']:.4f})")
            return fit

        csv_path = os.path.join(args.ckpt_dir, "evolve.csv")
        print(f"evolving {args.evolve} generations of {args.epochs}-epoch "
              f"trainings -> {csv_path}")
        hyp, best_fit = evolve(hyp, train_and_eval,
                               generations=args.evolve,
                               seed=args.evolve_seed,
                               # only rank 0 appends to evolve.csv — on a
                               # shared filesystem every rank writing would
                               # interleave duplicate rows
                               log_path=csv_path if main_proc else None)
        if main_proc:
            import yaml

            with open(os.path.join(args.ckpt_dir, "hyp_evolve.yaml"),
                      "w") as f:
                yaml.safe_dump({"fitness": float(best_fit),
                                "hyp": {k: float(v)
                                        for k, v in hyp.items()}}, f)
        print(f"evolution done: best fitness {best_fit:.4f}; "
              f"training final model with winning hyps")

    aug_cfg, loss_cfg, tcfg = make_cfgs(hyp)
    train_ds.aug = aug_cfg
    trainer = YoloTrainer(
        model, tcfg, loss_cfg=loss_cfg,
        steps_per_epoch=steps_per_epoch, mesh=mesh,
    )
    loggers = Loggers(args.ckpt_dir)
    step_counter = [0]

    if main_proc:
        # pre-training label-stats plot (reference plot_labels on
        # on_pretrain_routine_end, train.py:236 / utils/plots.py:180-426)
        from lpr_tpu.eval.plots import plot_labels

        lab_rows = []
        for i in range(min(len(train_ds), 1000)):
            lab = np.asarray(train_ds._load_raw(i)[1])
            if lab.ndim == 2 and lab.shape[1] == 5 and len(lab):
                lab_rows.append(lab)
        if lab_rows:
            plot_labels(np.concatenate(lab_rows),
                        os.path.join(args.ckpt_dir, "labels.png"))

    run = None
    if main_proc:
        from lpr_tpu.utils.registry import RunRegistry

        run = RunRegistry(args.runs_dir).new_run(
            args.run_project, config=vars(args),
            dataset_dirs=[d for d in (args.img_dir, args.label_dir,
                                      args.val_img_dir, args.val_label_dir)
                          if d])
        print(f"run {run.id} (dataset {run.manifest['dataset_fingerprint']})")

    def log(msg):
        if main_proc:
            print(msg)

    state = fit_yolo(
        trainer,
        lambda: train_ds.batches(batch_size, workers=args.workers),
        lambda: val_ds.batches(batch_size, shuffle=False,
                               workers=args.workers),
        epochs=args.epochs, ckpt_dir=args.ckpt_dir if main_proc else None,
        patience=args.patience, logger=log, init_params=init_params,
    )
    if run is not None:
        for fname, aliases in (("last.npz", ("latest",)),
                               ("best.npz", ("best",))):
            p = os.path.join(args.ckpt_dir, fname)
            if os.path.exists(p):
                run.log_artifact(p, aliases=aliases)
        run.finish({"epochs": args.epochs, **state.get("summary", {})})


if __name__ == "__main__":
    main()
