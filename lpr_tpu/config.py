"""Central typed configuration with YAML load/save.

The reference scatters hyperparameters across argparse defaults and three
yaml layers, with LPSR's architecture hard-coded at five call sites
(SURVEY.md §5.6).  Here every component has one frozen dataclass config and
this module round-trips any of them to YAML.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Type, TypeVar

import yaml

from lpr_tpu.data.degradation import DegradationConfig
from lpr_tpu.models.cyclegan import GeneratorConfig
from lpr_tpu.models.lpsr import LPSRConfig
from lpr_tpu.pipeline.recognizer import PipelineConfig
from lpr_tpu.train.cyclegan import CycleGANConfig
from lpr_tpu.train.lpsr import LPSRTrainConfig
from lpr_tpu.train.yolo import YoloTrainConfig
from lpr_tpu.train.yolo_loss import YoloLossConfig

T = TypeVar("T")

REGISTRY: Dict[str, type] = {
    "lpsr": LPSRConfig,
    "lpsr_train": LPSRTrainConfig,
    "pipeline": PipelineConfig,
    "cyclegan_gen": GeneratorConfig,
    "cyclegan_train": CycleGANConfig,
    "degradation": DegradationConfig,
    "yolo_train": YoloTrainConfig,
    "yolo_loss": YoloLossConfig,
}


def _to_plain(v: Any) -> Any:
    if isinstance(v, (list, tuple)):
        return [
            _to_plain(x) for x in v
        ]
    if hasattr(v, "dtype") or isinstance(v, type):
        return str(v)
    return v


def save_config(path: str, cfg: Any) -> None:
    name = next((k for k, c in REGISTRY.items() if isinstance(cfg, c)), None)
    data = {
        "kind": name or type(cfg).__name__,
        "values": {
            f.name: _to_plain(getattr(cfg, f.name))
            for f in dataclasses.fields(cfg)
            if not str(f.name).startswith("_")
        },
    }
    with open(path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)


def load_config(path: str, cls: Type[T] = None) -> T:
    with open(path) as f:
        data = yaml.safe_load(f)
    if cls is None:
        cls = REGISTRY[data["kind"]]
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data["values"].items():
        if k not in fields:
            continue
        cur = fields[k]
        if isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        if isinstance(v, str) and ("dtype" in k or k == "compute_dtype"
                                   or k == "weight_dtype"):
            import jax.numpy as jnp

            v = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
                v.split(".")[-1].strip("'><class \""), jnp.float32
            )
        kwargs[k] = v
    return cls(**kwargs)
