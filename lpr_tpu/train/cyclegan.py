"""CycleGAN trainer — the HR<->LR degradation-GAN training loop.

Reference: ``train/cyclegans.py:24-196``.  Semantics replicated exactly:
- two Generators + two spectral-norm PatchGAN Discriminators, normal(0,0.02)
  init (:32-41)
- G losses: identity L1 x5 both directions (:86-87), LSGAN MSE xλ_GAN=2.0
  (:80,92,96), cycle L1 x10 (A) and **x20 (B)** — the asymmetric cycle
  weights (:98-101)
- Adam lr 2e-4, betas (0.5, 0.999) (:47-57)
- ImagePool(50) feeding both D updates (:66-67,120,135); D losses x0.5
  (:125,139)

TPU re-design: three jitted, donated steps (G, D_A, D_B) over batched NHWC
tensors in [-1,1]; spectral-norm power iteration is functional state updated
inside the D steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from lpr_tpu.models.cyclegan import (
    GeneratorConfig,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
)
from lpr_tpu.data.image_pool import ImagePool


@dataclasses.dataclass(frozen=True)
class CycleGANConfig:
    lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    lambda_identity: float = 5.0
    lambda_gan: float = 2.0
    lambda_cycle_a: float = 10.0
    lambda_cycle_b: float = 20.0
    pool_size: int = 50


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


class CycleGANTrainer:
    def __init__(self, cfg: CycleGANConfig = CycleGANConfig(),
                 gen_cfg: GeneratorConfig = GeneratorConfig()):
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        self.tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
        self.pool_a = ImagePool(cfg.pool_size, seed=1)
        self.pool_b = ImagePool(cfg.pool_size, seed=2)

        def g_loss_fn(g_params, d_params, real_a, real_b):
            g_ab, g_ba = g_params["ab"], g_params["ba"]
            # identity
            id_b = generator_apply(g_ab, real_b)
            id_a = generator_apply(g_ba, real_a)
            loss_id = (_l1(id_b, real_b) + _l1(id_a, real_a)) * cfg.lambda_identity
            # GAN
            fake_b = generator_apply(g_ab, real_a)
            fake_a = generator_apply(g_ba, real_b)
            pred_fb, _ = discriminator_apply(d_params["b"], fake_b)
            pred_fa, _ = discriminator_apply(d_params["a"], fake_a)
            loss_gan = (
                _mse(pred_fb, jnp.ones_like(pred_fb))
                + _mse(pred_fa, jnp.ones_like(pred_fa))
            ) * cfg.lambda_gan
            # cycle (asymmetric weights)
            rec_a = generator_apply(g_ba, fake_b)
            rec_b = generator_apply(g_ab, fake_a)
            loss_cyc = (_l1(rec_a, real_a) * cfg.lambda_cycle_a
                        + _l1(rec_b, real_b) * cfg.lambda_cycle_b)
            total = loss_id + loss_gan + loss_cyc
            aux = {"fake_a": fake_a, "fake_b": fake_b, "id": loss_id,
                   "gan": loss_gan, "cyc": loss_cyc}
            return total, aux

        def g_step(g_params, g_opt, d_params, real_a, real_b):
            (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                g_params, d_params, real_a, real_b
            )
            updates, g_opt = self.tx.update(grads, g_opt, g_params)
            g_params = optax.apply_updates(g_params, updates)
            return g_params, g_opt, loss, aux

        def d_loss_fn(d, real, fake):
            pred_r, d_new = discriminator_apply(d, real, update_sn=True)
            pred_f, _ = discriminator_apply(d_new, fake)
            loss = (_mse(pred_r, jnp.ones_like(pred_r))
                    + _mse(pred_f, jnp.zeros_like(pred_f))) * 0.5
            return loss, d_new

        def d_step(d, d_opt, real, fake):
            (loss, d_sn), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d, real, jax.lax.stop_gradient(fake)
            )
            updates, d_opt = self.tx.update(grads, d_opt, d)
            d = optax.apply_updates(d, updates)
            # carry the updated power-iteration vectors
            d = {**d, "convs": [
                {**cp, "u": sn["u"]} for cp, sn in zip(d["convs"], d_sn["convs"])
            ]}
            return d, d_opt, loss

        self._g_step = jax.jit(g_step, donate_argnums=(0, 1))
        self._d_step = jax.jit(d_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def init(self, key) -> Dict[str, Any]:
        ks = jax.random.split(key, 4)
        g_params = {
            "ab": generator_init(ks[0], self.gen_cfg),
            "ba": generator_init(ks[1], self.gen_cfg),
        }
        d_params = {
            "a": discriminator_init(ks[2], self.gen_cfg.in_channels),
            "b": discriminator_init(ks[3], self.gen_cfg.out_channels),
        }
        return {
            "g": g_params, "d": d_params,
            "g_opt": self.tx.init(g_params),
            "da_opt": self.tx.init(d_params["a"]),
            "db_opt": self.tx.init(d_params["b"]),
        }

    def step(self, state: Dict[str, Any], real_a, real_b):
        """One full iteration: G update, then D_A / D_B on pooled fakes
        (reference :78-141)."""
        import numpy as np

        g, g_opt, g_loss, aux = self._g_step(
            state["g"], state["g_opt"], state["d"], real_a, real_b
        )
        fake_a = self.pool_a.query(np.asarray(aux["fake_a"]))
        fake_b = self.pool_b.query(np.asarray(aux["fake_b"]))
        da, da_opt, da_loss = self._d_step(
            state["d"]["a"], state["da_opt"], real_a, jnp.asarray(fake_a)
        )
        db, db_opt, db_loss = self._d_step(
            state["d"]["b"], state["db_opt"], real_b, jnp.asarray(fake_b)
        )
        new_state = {
            "g": g, "g_opt": g_opt, "d": {"a": da, "b": db},
            "da_opt": da_opt, "db_opt": db_opt,
        }
        metrics = {
            "g_loss": float(g_loss), "d_a_loss": float(da_loss),
            "d_b_loss": float(db_loss), "id": float(aux["id"]),
            "gan": float(aux["gan"]), "cyc": float(aux["cyc"]),
        }
        return new_state, metrics
