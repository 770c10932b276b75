"""CycleGAN generator/discriminator for HR->LR degradation synthesis.

TPU-native re-design of the reference models (``my_models/cycle_gans.py``):
- Generator (:42-104): ReflectionPad+7x7 -> 2x stride-2 downsample -> 9
  InstanceNorm ResNet blocks -> 2x nearest-upsample+conv -> 7x7 -> tanh.
- Discriminator (:107-139): PatchGAN of 4x4 stride-2 convs with **spectral
  norm** + InstanceNorm + LeakyReLU(0.2).

Functional params + pure apply (NHWC).  Spectral norm is implemented the
JAX way: power-iteration state (u vector per conv) lives in the params
pytree and is updated functionally each discriminator forward during
training (torch hides this in a forward pre-hook).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.ops import nn as tnn
from lpr_tpu.weights import convert as cvt

Params = Any


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    in_channels: int = 3
    out_channels: int = 3
    n_resnet_blocks: int = 9
    base: int = 64


def _normal_conv(key, kh, kw, cin, cout, std=0.02, bias=True):
    """normal(0, 0.02) init (reference train/cyclegans.py:15-21)."""
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (kh, kw, cin, cout), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def generator_init(key, cfg: GeneratorConfig = GeneratorConfig()) -> Params:
    b = cfg.base
    ks = jax.random.split(key, 8 + cfg.n_resnet_blocks * 2)
    p: Dict[str, Any] = {
        "head": _normal_conv(ks[0], 7, 7, cfg.in_channels, b),
        "down0": _normal_conv(ks[1], 3, 3, b, b * 2),
        "down1": _normal_conv(ks[2], 3, 3, b * 2, b * 4),
        "blocks": [],
        "up0": _normal_conv(ks[3], 3, 3, b * 4, b * 2),
        "up1": _normal_conv(ks[4], 3, 3, b * 2, b),
        "tail": _normal_conv(ks[5], 7, 7, b, cfg.out_channels),
    }
    for i in range(cfg.n_resnet_blocks):
        p["blocks"].append({
            "c0": _normal_conv(ks[6 + 2 * i], 3, 3, b * 4, b * 4),
            "c1": _normal_conv(ks[7 + 2 * i], 3, 3, b * 4, b * 4),
        })
    return p


def _resnet_block(p, x):
    """Reflection-padded InstanceNorm residual block (cycle_gans.py:9-40)."""
    y = tnn.reflect_pad2d(x, 1)
    y = tnn.conv2d(y, p["c0"]["w"], p["c0"]["b"], padding=0)
    y = tnn.relu(tnn.instance_norm(y))
    y = tnn.reflect_pad2d(y, 1)
    y = tnn.conv2d(y, p["c1"]["w"], p["c1"]["b"], padding=0)
    return x + tnn.instance_norm(y)


def generator_apply(p: Params, x: jax.Array) -> jax.Array:
    """x: (N, H, W, C) in [-1, 1] -> (N, H, W, C) in [-1, 1] (tanh)."""
    y = tnn.reflect_pad2d(x, 3)
    y = tnn.conv2d(y, p["head"]["w"], p["head"]["b"], padding=0)
    y = tnn.relu(tnn.instance_norm(y))
    y = tnn.conv2d(y, p["down0"]["w"], p["down0"]["b"], stride=2, padding=1)
    y = tnn.relu(tnn.instance_norm(y))
    y = tnn.conv2d(y, p["down1"]["w"], p["down1"]["b"], stride=2, padding=1)
    y = tnn.relu(tnn.instance_norm(y))
    for bp in p["blocks"]:
        y = _resnet_block(bp, y)
    y = tnn.upsample_nearest(y, 2)
    y = tnn.conv2d(y, p["up0"]["w"], p["up0"]["b"], padding=1)
    y = tnn.relu(tnn.instance_norm(y))
    y = tnn.upsample_nearest(y, 2)
    y = tnn.conv2d(y, p["up1"]["w"], p["up1"]["b"], padding=1)
    y = tnn.relu(tnn.instance_norm(y))
    y = tnn.reflect_pad2d(y, 3)
    y = tnn.conv2d(y, p["tail"]["w"], p["tail"]["b"], padding=0)
    return jnp.tanh(y)


def generator_from_torch(sd: Dict[str, np.ndarray]) -> Params:
    """Import reference Generator state dict (model.{i} Sequential indices:
    1 head, 4 down0, 7 down1, 10..18 blocks, 20 up0, 23 up1, 26 tail)."""

    def conv(i):
        return {"w": jnp.asarray(cvt.conv_w(sd[f"model.{i}.weight"])),
                "b": jnp.asarray(cvt.vec(sd[f"model.{i}.bias"]))}

    blocks = []
    for i in range(10, 19):
        blocks.append({
            "c0": {"w": jnp.asarray(cvt.conv_w(sd[f"model.{i}.conv_block.1.weight"])),
                   "b": jnp.asarray(cvt.vec(sd[f"model.{i}.conv_block.1.bias"]))},
            "c1": {"w": jnp.asarray(cvt.conv_w(sd[f"model.{i}.conv_block.5.weight"])),
                   "b": jnp.asarray(cvt.vec(sd[f"model.{i}.conv_block.5.bias"]))},
        })
    return {
        "head": conv(1), "down0": conv(4), "down1": conv(7),
        "blocks": blocks, "up0": conv(20), "up1": conv(23), "tail": conv(26),
    }


# ---------------------------------------------------------------------------
# PatchGAN discriminator with spectral norm


def discriminator_init(key, in_channels: int = 3) -> Params:
    ks = jax.random.split(key, 6)
    chans = [(in_channels, 64), (64, 128), (128, 256), (256, 512)]
    p: Dict[str, Any] = {"convs": []}
    for i, (c1, c2) in enumerate(chans):
        cp = _normal_conv(ks[i], 4, 4, c1, c2, bias=(i == 0))
        cp["u"] = jax.random.normal(jax.random.fold_in(ks[i], 7), (c2,), jnp.float32)
        p["convs"].append(cp)
    p["final"] = _normal_conv(ks[4], 4, 4, 512, 1, bias=True)
    return p


def _spectral_normalize(w: jax.Array, u: jax.Array, n_iter: int = 1):
    """One step of power iteration on W (flattened to (cout, rest)), torch
    spectral_norm semantics.  Returns (w / sigma, new_u)."""
    cout = w.shape[-1]
    wm = w.reshape(-1, cout).T  # (cout, rest)
    for _ in range(n_iter):
        v = wm.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = wm @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        u = u_new
    sigma = u @ (wm @ v)
    return w / sigma, jax.lax.stop_gradient(u)


def discriminator_apply(p: Params, x: jax.Array, update_sn: bool = False):
    """PatchGAN forward.  Returns (logits map, new_params) — new params carry
    updated power-iteration vectors when update_sn (training)."""
    new_p = {"convs": [], "final": p["final"]}
    y = x
    for i, cp in enumerate(p["convs"]):
        w, u = _spectral_normalize(cp["w"], cp["u"])
        ncp = dict(cp)
        if update_sn:
            ncp["u"] = u
        new_p["convs"].append(ncp)
        stride = 2 if i < 3 else 1
        y = tnn.conv2d(y, w, cp.get("b"), stride=stride, padding=1)
        if i > 0:
            y = tnn.instance_norm(y)
        y = tnn.leaky_relu(y, 0.2)
    y = tnn.conv2d(y, p["final"]["w"], p["final"]["b"], stride=1, padding=1)
    return y, new_p
