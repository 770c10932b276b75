"""LPSR trainer — MSE + Adam + plateau LR on validation PSNR.

Reference counterpart: ``train/lpsr.py:97-201`` (MSE loss :131, Adam :132,
ReduceLROnPlateau(max, x0.5, patience 10) on val PSNR :133-135,191, best/last
checkpointing :193-201).  TPU re-design: one jitted, donated train step; the
whole val epoch runs as a batched device computation (the reference computes
PSNR per-image on the host via skimage, round-tripping every batch); data
parallelism via sharding annotations over a 1-D mesh (the DDP equivalent,
SURVEY.md §2.8) — XLA inserts the gradient allreduce.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lpr_tpu.models.lpsr import LPSRConfig, lpsr_apply, lpsr_init
from lpr_tpu.parallel.mesh import batch_sharding, replicate, shard_batch


@dataclasses.dataclass(frozen=True)
class LPSRTrainConfig:
    lr: float = 1e-3              # reference train/lpsr.py:214 (scripts use 1e-4)
    plateau_factor: float = 0.5   # :133-135
    plateau_patience: int = 10
    min_lr: float = 1e-6
    weight_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR over trailing dims, batched (device-side skimage
    peak_signal_noise_ratio equivalent, reference train/lpsr.py:181-186)."""
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred - target) ** 2, axis=axes)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


class LPSRTrainer:
    """Functional trainer; state = (params, opt_state, lr_scale)."""

    def __init__(
        self,
        cfg: LPSRTrainConfig = LPSRTrainConfig(),
        lpsr_cfg: LPSRConfig = LPSRConfig(),
        mesh=None,
    ):
        self.cfg = cfg
        self.lpsr_cfg = lpsr_cfg
        self.mesh = mesh
        self.tx = optax.scale_by_adam()

        def loss_fn(params, lr_img, hr_img):
            pred = lpsr_apply(params, lr_img.astype(cfg.compute_dtype), lpsr_cfg)
            return jnp.mean((pred.astype(jnp.float32) - hr_img) ** 2)

        def train_step(params, opt_state, lr_scale, lr_img, hr_img):
            loss, grads = jax.value_and_grad(loss_fn)(params, lr_img, hr_img)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            # Adam direction * (-lr): matches torch Adam + external plateau LR
            updates = jax.tree.map(lambda u: -cfg.lr * lr_scale * u, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step(params, lr_img, hr_img):
            pred = lpsr_apply(params, lr_img.astype(cfg.compute_dtype), lpsr_cfg)
            pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
            return psnr(pred, hr_img)

        if mesh is not None:
            bs = batch_sharding(mesh)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rs = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rs, rs, rs, bs, bs),
                out_shardings=(rs, rs, rs),
                donate_argnums=(0, 1),
            )
            self._eval_step = jax.jit(
                eval_step, in_shardings=(rs, bs, bs), out_shardings=bs
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def init(self, key=None, params=None):
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = lpsr_init(key, self.lpsr_cfg)
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        return {"params": params, "opt_state": opt_state,
                "lr_scale": jnp.float32(1.0), "best_psnr": -np.inf, "bad_epochs": 0}

    def step(self, state: Dict, lr_img, hr_img) -> Tuple[Dict, float]:
        if self.mesh is not None:
            lr_img, hr_img = shard_batch((lr_img, hr_img), self.mesh)
        params, opt_state, loss = self._train_step(
            state["params"], state["opt_state"], state["lr_scale"], lr_img, hr_img
        )
        state = dict(state, params=params, opt_state=opt_state)
        return state, loss

    def validate(self, state: Dict, batches: Iterable) -> float:
        """Mean per-image PSNR.  Multi-process: every rank feeds its local
        shard of each global batch; the per-image PSNRs are allgathered so
        all ranks return the identical global mean (keeps the plateau-LR
        decision consistent across ranks without a broadcast)."""
        multiproc = self.mesh is not None and jax.process_count() > 1
        vals = []
        for lr_img, hr_img in batches:
            if self.mesh is not None:
                lr_img, hr_img = shard_batch((lr_img, hr_img), self.mesh)
            v = self._eval_step(state["params"], lr_img, hr_img)
            if multiproc:
                from jax.experimental import multihost_utils

                v = multihost_utils.process_allgather(v, tiled=True)
            vals.append(np.asarray(v))
        return float(np.mean(np.concatenate(vals))) if vals else float("nan")

    def plateau_update(self, state: Dict, val_psnr: float) -> Dict:
        """ReduceLROnPlateau(mode=max) semantics (reference :133-135)."""
        if val_psnr > state["best_psnr"]:
            return dict(state, best_psnr=val_psnr, bad_epochs=0)
        bad = state["bad_epochs"] + 1
        if bad > self.cfg.plateau_patience:
            new_scale = max(
                float(state["lr_scale"]) * self.cfg.plateau_factor,
                self.cfg.min_lr / self.cfg.lr,
            )
            return dict(state, bad_epochs=0, lr_scale=jnp.float32(new_scale))
        return dict(state, bad_epochs=bad)

    def fit(
        self,
        train_batches_fn,
        val_batches_fn,
        epochs: int,
        ckpt_dir: Optional[str] = None,
        log_every: int = 50,
        logger=print,
        init_params=None,
    ) -> Dict:
        """Full loop mirroring reference train/lpsr.py:155-201: per-epoch
        train + val PSNR + plateau step + best/last checkpoints.
        ``init_params`` warm-starts from a prior checkpoint (resume)."""
        from lpr_tpu.weights.checkpoint import save_params

        state = self.init(params=init_params)
        best = -np.inf
        for epoch in range(epochs):
            losses = []
            for i, (lr_img, hr_img) in enumerate(train_batches_fn()):
                state, loss = self.step(state, lr_img, hr_img)
                losses.append(float(loss))
                if log_every and i % log_every == 0:
                    logger(f"epoch {epoch} it {i} loss {float(loss):.5f}")
            val_psnr = self.validate(state, val_batches_fn())
            state = self.plateau_update(state, val_psnr)
            logger(
                f"epoch {epoch}: loss {np.mean(losses):.5f} val PSNR {val_psnr:.3f} "
                f"lr_scale {float(state['lr_scale']):.4f}"
            )
            if ckpt_dir:
                save_params(f"{ckpt_dir}/last_model.npz", state["params"])
                if val_psnr > best:
                    best = val_psnr
                    save_params(f"{ckpt_dir}/best_model.npz", state["params"])
        return state
