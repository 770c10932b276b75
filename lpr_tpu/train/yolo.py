"""YOLO detector trainer shell.

Reference: ``yolov5/train.py:65-643`` — 3-param-group SGD (BN weights no
decay, conv weights decayed, biases no decay, :156-176), linear/one-cycle LR
(:178-183), per-iteration warmup incl. bias-lr ramp (:271,309-318), EMA
(``utils/torch_utils.py:299``, decay ramp ``0.9999*(1-exp(-x/2000))``),
gradient accumulation to nominal batch 64 (:151-152), early stopping
(``torch_utils.py:276``).

TPU re-design: one jitted, donated train step containing forward, loss,
grad accumulation (via lax.scan over micro-batches when requested), SGD+EMA
update; LR/momentum warmup computed functionally from the step counter.
AMP GradScaler is unnecessary — bf16 on TPU trains without loss scaling.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lpr_tpu.models.yolo import YoloModel
from lpr_tpu.parallel.mesh import batch_sharding, replicate, shard_batch
from lpr_tpu.train.yolo_loss import YoloLossConfig, yolo_loss


@dataclasses.dataclass(frozen=True)
class YoloTrainConfig:
    lr0: float = 0.01
    lrf: float = 0.01            # final OneCycle fraction
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    cos_lr: bool = False
    epochs: int = 300
    nominal_batch: int = 64
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    compute_dtype: Any = jnp.float32


def _is_conv_weight(path) -> bool:
    """Conv/linear kernels get weight decay; biases and BN params don't
    (reference 3-group split, train.py:156-167)."""
    last = str(getattr(path[-1], "key", ""))
    in_bn = any(str(getattr(p, "key", "")) == "bn" for p in path[:-1])
    return last == "w" and not in_bn


def _is_bias(path) -> bool:
    last = str(getattr(path[-1], "key", ""))
    return last in ("b", "beta")


def lr_schedule(cfg: YoloTrainConfig, epoch_f: jnp.ndarray) -> jnp.ndarray:
    """One-cycle cosine or linear decay over epochs (train.py:178-183)."""
    x = jnp.clip(epoch_f / cfg.epochs, 0.0, 1.0)
    if cfg.cos_lr:
        return (1 - x) * (1.0 - cfg.lrf) * 0.5 * (1 + jnp.cos(jnp.pi * x)) + cfg.lrf  # noqa
    return (1.0 - x) * (1.0 - cfg.lrf) + cfg.lrf


class YoloTrainer:
    def __init__(
        self,
        model: YoloModel,
        cfg: YoloTrainConfig = YoloTrainConfig(),
        loss_cfg: YoloLossConfig = YoloLossConfig(),
        steps_per_epoch: int = 100,
        mesh=None,
        accumulate: int = 1,
    ):
        """``accumulate``: micro-batches summed per optimizer step (pass
        images of shape (accumulate*b, ...) to step()); the reference derives
        it as nominal_batch/batch (train.py:151-152)."""
        self.model = model
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        self.steps_per_epoch = steps_per_epoch
        self.mesh = mesh
        self.accumulate = accumulate
        anchors = jnp.asarray(model.anchors)
        accumulate = max(int(accumulate), 1)

        warmup_steps = max(round(cfg.warmup_epochs * steps_per_epoch), 100)

        def loss_fn(params, images, labels):
            raws, bn_params = model.apply(
                params, images.astype(cfg.compute_dtype), decode=False,
                train=True,
            )
            raws = [r.astype(jnp.float32) for r in raws]
            total, comps = yolo_loss(raws, labels, anchors, loss_cfg)
            return total, (comps, bn_params)

        def _take_bn_stats(updated, bn_src):
            """Overwrite running mean/var in ``updated`` from the train-pass
            EMA tree."""
            flat_u, treedef = jax.tree_util.tree_flatten_with_path(updated)
            flat_b = jax.tree_util.tree_flatten_with_path(bn_src)[0]
            out = []
            for (path, u), (_, b) in zip(flat_u, flat_b):
                keys = [str(getattr(p, "key", "")) for p in path]
                if len(keys) >= 2 and keys[-2] == "bn" and keys[-1] in (
                    "mean", "var"
                ):
                    out.append(b)
                else:
                    out.append(u)
            return jax.tree_util.tree_unflatten(treedef, out)

        def train_step(params, momenta, ema, step, images, labels):
            if accumulate > 1:
                # gradient accumulation to the nominal batch (reference
                # train.py:151-152,329-346): sum grads over `accumulate`
                # micro-batches, one optimizer step.  lax.scan keeps one
                # micro-batch of activations live at a time.
                mb_i = images.reshape(accumulate, -1, *images.shape[1:])
                mb_l = labels.reshape(accumulate, -1, *labels.shape[1:])

                def body(carry, mb):
                    # p_cur = params with the running BN stats evolved by the
                    # previous micro-batches: torch updates running mean/var
                    # on EVERY forward (train.py micro-batch loop), and in
                    # train mode the stats don't affect outputs/grads, so
                    # threading them through the carry matches torch without
                    # perturbing the accumulated gradient.
                    g_acc, p_cur, tot = carry
                    (t, (comps, bn)), g = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(p_cur, mb[0], mb[1])
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    return (g_acc, _take_bn_stats(p_cur, bn), tot + t), comps

                g0 = jax.tree.map(jnp.zeros_like, params)
                (grads, bn_params, total), comps_seq = jax.lax.scan(
                    body, (g0, params, jnp.float32(0.0)), (mb_i, mb_l)
                )
                comps = jax.tree.map(lambda a: a[-1], comps_seq)
            else:
                (total, (comps, bn_params)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, images, labels)
            epoch_f = step.astype(jnp.float32) / steps_per_epoch
            base_lr = cfg.lr0 * lr_schedule(cfg, epoch_f)
            wprog = jnp.clip(step.astype(jnp.float32) / warmup_steps, 0.0, 1.0)
            lr_w = base_lr * wprog
            lr_b = cfg.warmup_bias_lr + (base_lr - cfg.warmup_bias_lr) * wprog
            lr_b = jnp.where(wprog >= 1.0, base_lr, lr_b)
            mom = cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * wprog

            flat_g, treedef = jax.tree_util.tree_flatten_with_path(grads)
            flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
            flat_m = jax.tree_util.tree_flatten_with_path(momenta)[0]
            new_p, new_m = [], []
            for (path, g), (_, p), (_, m) in zip(flat_g, flat_p, flat_m):
                lr = lr_b if _is_bias(path) else lr_w
                if _is_conv_weight(path):
                    g = g + cfg.weight_decay * p
                m_new = mom * m + g  # torch SGD momentum (dampening 0)
                update = g + mom * m_new  # nesterov
                new_p.append(p - lr * update)
                new_m.append(m_new)
            cand_p = jax.tree_util.tree_unflatten(treedef, new_p)
            cand_m = jax.tree_util.tree_unflatten(treedef, new_m)
            cand_p = _take_bn_stats(cand_p, bn_params)

            # EMA with ramped decay (torch_utils.py:299-317)
            d = cfg.ema_decay * (1.0 - jnp.exp(-(step + 1).astype(jnp.float32)
                                               / cfg.ema_tau))
            cand_e = jax.tree.map(lambda e, q: e * d + (1.0 - d) * q,
                                  ema, cand_p)

            # Non-finite guard: a NaN/Inf loss or gradient makes the whole
            # step a true no-op (params/momenta/EMA/BN all keep their old
            # values) so one bad batch can't poison the weights; the step
            # counter still advances so schedules stay on wall-clock.  The
            # host-side StepGuard in fit_yolo handles escalation/halt.
            from lpr_tpu.utils.guards import tree_all_finite

            ok = jnp.logical_and(jnp.isfinite(total), tree_all_finite(grads))

            def sel(new, old):
                return jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                                    new, old)

            params = sel(cand_p, params)
            momenta = sel(cand_m, momenta)
            ema = sel(cand_e, ema)
            return params, momenta, ema, step + 1, total, comps

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rs = NamedSharding(mesh, P())
            bs = batch_sharding(mesh)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rs, rs, rs, rs, bs, bs),
                out_shardings=(rs, rs, rs, rs, rs, rs),
                donate_argnums=(0, 1, 2),
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def init(self, key=None, params=None) -> Dict[str, Any]:
        if params is None:
            params = self.model.init(key if key is not None
                                     else jax.random.PRNGKey(0))
        momenta = jax.tree.map(jnp.zeros_like, params)
        ema = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        state = {"params": params, "momenta": momenta, "ema": ema,
                 "step": jnp.int32(0)}
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def step(self, state: Dict[str, Any], images, labels):
        if self.mesh is not None:
            images, labels = shard_batch((images, labels), self.mesh)
        params, momenta, ema, step, total, comps = self._train_step(
            state["params"], state["momenta"], state["ema"], state["step"],
            images, labels,
        )
        return (
            {"params": params, "momenta": momenta, "ema": ema, "step": step},
            total, comps,
        )


def validate_map(
    model: YoloModel, params, batches, conf_thres: float = 0.001,
    iou_thres: float = 0.6, max_det: int = 300, dtype=jnp.float32,
):
    """Run detection + NMS over a val set and compute mAP (the reference's
    missing val.py, reconstructed from its train-loop usage + metrics)."""
    import functools

    from lpr_tpu.eval.metrics import DetectionEvaluator
    from lpr_tpu.ops.nms import nms_batched

    @jax.jit
    def step(params, images):
        pred, _ = model.apply(params, images.astype(dtype))
        return nms_batched(pred, conf_thres, iou_thres, max_det=max_det,
                           pre_topk=min(512, pred.shape[1]),
                           multi_label=True, agnostic=False)

    ev = DetectionEvaluator()
    for batch in batches:
        # rect val batches carry a real-count third element (pad rows are
        # blank images that must not enter the evaluator)
        images, labels = batch[0], batch[1]
        n_real = batch[2] if len(batch) > 2 else images.shape[0]
        h, w = images.shape[1:3]
        det = jax.device_get(step(params, jnp.asarray(images)))
        for i in range(n_real):
            n = int(det["count"][i])
            lab = np.asarray(labels[i])
            lab = lab[lab[:, 3] > 0]
            gt_xyxy = np.stack([
                (lab[:, 1] - lab[:, 3] / 2) * w, (lab[:, 2] - lab[:, 4] / 2) * h,
                (lab[:, 1] + lab[:, 3] / 2) * w, (lab[:, 2] + lab[:, 4] / 2) * h,
            ], 1) if len(lab) else np.zeros((0, 4), np.float32)
            ev.add(det["boxes"][i][:n], det["scores"][i][:n],
                   det["classes"][i][:n], gt_xyxy, lab[:, 0].astype(int))
    return ev.compute()


def fit_yolo(
    trainer: "YoloTrainer",
    train_batches_fn,
    val_batches_fn,
    epochs: int,
    ckpt_dir: Optional[str] = None,
    patience: int = 100,
    logger=print,
    callbacks=None,
    init_params=None,
):
    """Full training shell (reference train.py:265-420): per-epoch train,
    EMA-weighted val mAP, fitness-based best checkpointing, early stop.
    ``init_params``: warm-start weights (the reference's --weights
    fine-tune path, train.py:117-130)."""
    from lpr_tpu.utils.guards import StepGuard
    from lpr_tpu.weights.checkpoint import save_params

    state = trainer.init(params=init_params)
    stopper = EarlyStopping(patience=patience)
    guard = StepGuard()
    best = fit = 0.0
    metrics = {"map50": 0.0, "map": 0.0}
    if callbacks:
        callbacks.run("on_train_start")
    for epoch in range(epochs):
        losses = []
        for images, labels in train_batches_fn():
            state, total, comps = trainer.step(
                state, jnp.asarray(images), jnp.asarray(labels)
            )
            loss = float(total)
            if guard.check(loss):
                losses.append(loss)
        ema = state["ema"]
        if trainer.mesh is not None and jax.process_count() > 1:
            # validate_map's plain jit runs per-process on local devices;
            # fetch the (replicated) EMA weights off the global mesh first.
            # Every rank validates the full set redundantly so the early-stop
            # decision stays identical across ranks without a broadcast.
            ema = jax.device_get(ema)
        metrics = validate_map(trainer.model, ema, val_batches_fn())
        fit = fitness(metrics)
        logger(
            f"epoch {epoch}: loss {np.mean(losses) if losses else np.nan:.4f} "
            f"mAP50 {metrics['map50']:.4f} mAP {metrics['map']:.4f} "
            f"fitness {fit:.4f}"
        )
        if callbacks:
            callbacks.run("on_fit_epoch_end", epoch, metrics)
        if ckpt_dir:
            save_params(f"{ckpt_dir}/last.npz", state["ema"])
            if fit >= best:
                best = fit
                save_params(f"{ckpt_dir}/best.npz", state["ema"])
        if stopper(epoch, fit):
            logger(f"early stopping at epoch {epoch} (best {best:.4f})")
            break
    if callbacks:
        callbacks.run("on_train_end")
    # final-val summary for the run registry (W&B wandb_log final-metrics
    # semantics): callers hand this to Run.finish() so committed manifests
    # carry the numbers, not `summary: null`
    state["summary"] = {
        "best_fitness": float(best),
        "final_fitness": float(fit),
        "final_map50": float(metrics["map50"]),
        "final_map": float(metrics["map"]),
    }
    return state


@dataclasses.dataclass
class EarlyStopping:
    """Stop after ``patience`` epochs without fitness improvement
    (reference torch_utils.py:276-296)."""

    patience: int = 100
    best_fitness: float = 0.0
    best_epoch: int = 0

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_fitness = fitness
            self.best_epoch = epoch
        return (epoch - self.best_epoch) >= self.patience


def fitness(metrics: Dict[str, float]) -> float:
    """0.9*mAP50-95 + 0.1*mAP50 (reference utils/metrics.py fitness)."""
    return 0.9 * metrics.get("map", 0.0) + 0.1 * metrics.get("map50", 0.0)
