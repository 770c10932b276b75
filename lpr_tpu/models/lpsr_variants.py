"""Experimental LPSR architecture variants (reference experiments/ver01-03).

The reference tracks the enhancer's design evolution in three standalone
experiment models (``experiments/ver0{1,2,3}/model.py``); they are provenance
for the production architecture and useful for ablations:

- **ver01** (:94-112): plain RDN -> channel attention -> PixelShuffle
  upscale -> 3x3 conv (true 2x/4x SR, linear output).
- **ver02** (:99-121): adds an input 3x3 conv and a sigmoid output.
- **ver03** (:6-92): replaces the RDN with a single IFE conv and introduces
  the CSAR block (conv-based CA + the SA design later used in production),
  interleaving CSAR blocks with upscaling.

Implemented compactly on the production building blocks; all jittable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List

import jax
import jax.numpy as jnp

from lpr_tpu.models.lpsr import (
    LPSRConfig,
    _conv,
    _conv_init,
    _csar,
    _csar_init,
    _rdb,
    _rdb_init,
)
from lpr_tpu.ops import nn as tnn


def _upscale_init(key, channels: int, scale_factor: int):
    """Conv(c->4c) + ReLU + PixelShuffle(2), repeated log2(scale) times
    (reference ver01 UpScaling / production my_models/lpsr.py:228-249)."""
    stages = int(math.log2(scale_factor)) if scale_factor > 1 else 0
    ks = jax.random.split(key, max(stages, 1))
    return [_conv_init(ks[i], 3, 3, channels, channels * 4)
            for i in range(stages)]


def _upscale(params: List, x):
    for p in params:
        x = tnn.pixel_shuffle(tnn.relu(_conv(p, x)), 2)
    return x


def _rdn_plain_init(key, cfg: LPSRConfig):
    """Plain RDN (no CSAR interleave): sfe 7x7+3x3, num_blocks RDBs, GFF."""
    ks = jax.random.split(key, 4 + cfg.num_blocks)
    return {
        "sf1": _conv_init(ks[0], 7, 7, cfg.num_channels, cfg.num_features),
        "sf2": _conv_init(ks[1], 3, 3, cfg.num_features, cfg.num_features),
        "rdbs": [_rdb_init(ks[4 + i], cfg) for i in range(cfg.num_blocks)],
        "gff0": _conv_init(ks[2], 1, 1, cfg.num_features * cfg.num_blocks,
                           cfg.num_features),
        "gff1": _conv_init(ks[3], 3, 3, cfg.num_features, cfg.num_features),
    }


def _rdn_plain(p, x):
    sfe1 = _conv(p["sf1"], x)
    y = _conv(p["sf2"], sfe1)
    feats = []
    for bp in p["rdbs"]:
        y = _rdb(bp, y)
        feats.append(y)
    y = jnp.concatenate(feats, -1)
    return _conv(p["gff1"], _conv(p["gff0"], y)) + sfe1


def _ca_conv_init(key, c):
    """Conv-based channel attention (ver01/ver03: GAP -> 1x1 c->c/2 -> ReLU
    -> 1x1 c/2->c -> sigmoid; mask only)."""
    k1, k2 = jax.random.split(key)
    return {"c1": _conv_init(k1, 1, 1, c, c // 2),
            "c2": _conv_init(k2, 1, 1, c // 2, c)}


def _ca_conv(p, x):
    g = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)
    g = tnn.relu(_conv(p["c1"], g))
    return jax.nn.sigmoid(_conv(p["c2"], g))


@dataclasses.dataclass(frozen=True)
class VariantConfig:
    num_channels: int = 3
    num_features: int = 32
    growth_rate: int = 16
    num_blocks: int = 4
    num_layers: int = 4
    scale_factor: int = 2


def ver01_init(key, cfg: VariantConfig = VariantConfig()):
    lcfg = LPSRConfig(cfg.num_channels, cfg.num_features, cfg.growth_rate,
                      cfg.num_blocks, cfg.num_layers)
    ks = jax.random.split(key, 4)
    return {
        "rdn": _rdn_plain_init(ks[0], lcfg),
        "ca": _ca_conv_init(ks[1], cfg.num_features),
        "up": _upscale_init(ks[2], cfg.num_features, cfg.scale_factor),
        "final": _conv_init(ks[3], 3, 3, cfg.num_features, cfg.num_channels),
    }


def ver01_apply(p, x):
    """RDN -> CA -> upscale -> conv (linear output)."""
    y = _rdn_plain(p["rdn"], x)
    y = y * _ca_conv(p["ca"], y)
    y = _upscale(p["up"], y)
    return _conv(p["final"], y)


def ver02_init(key, cfg: VariantConfig = VariantConfig()):
    ks = jax.random.split(key, 2)
    return {
        "conv_in": _conv_init(ks[0], 3, 3, cfg.num_channels, cfg.num_channels),
        **ver01_init(ks[1], cfg),
    }


def ver02_apply(p, x):
    """input conv + ver01 + sigmoid output."""
    y = _conv(p["conv_in"], x)
    return jax.nn.sigmoid(ver01_apply(p, y))


def ver03_init(key, cfg: VariantConfig = VariantConfig()):
    stages = int(math.log2(cfg.scale_factor)) if cfg.scale_factor > 1 else 0
    ks = jax.random.split(key, 4 + cfg.num_blocks + stages)
    return {
        "ife": _conv_init(ks[0], 3, 3, cfg.num_channels, cfg.num_features),
        "csars": [_csar_init(ks[2 + i], cfg.num_features)
                  for i in range(cfg.num_blocks)],
        "up": _upscale_init(ks[1], cfg.num_features, cfg.scale_factor),
        "final": _conv_init(
            jax.random.fold_in(ks[0], 9), 3, 3, cfg.num_features,
            cfg.num_channels,
        ),
    }


def ver03_apply(p, x):
    """IFE conv -> CSAR stack -> upscale -> conv -> sigmoid (the CSAR design
    that graduated into the production LPSR)."""
    y = _conv(p["ife"], x)
    for cp in p["csars"]:
        y = _csar(cp, y)
    y = _upscale(p["up"], y)
    return jax.nn.sigmoid(_conv(p["final"], y))
