"""Export native params back to reference-compatible torch checkpoints.

Round-trip interop: a user migrating from the reference can train here and
still load the result with the reference's loaders
(``inference/run.py:124-128`` expects the full 158-tensor LPSR state dict,
including the dead RDBs and the duplicated shared-CSAR entries — see
SURVEY.md §2.1).  Uses the baked-in cpu torch only for serialization.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from lpr_tpu.models.lpsr import LPSRConfig


def _t(a):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def _conv_to(sd, name, p, bias=True):
    sd[f"{name}.weight"] = _t(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    if bias and "b" in p:
        sd[f"{name}.bias"] = _t(p["b"])


def _dw_to(sd, name, p):
    sd[f"{name}.dConv.0.weight"] = _t(
        np.transpose(np.asarray(p["dw"]["w"]), (3, 2, 0, 1))
    )
    sd[f"{name}.dConv.0.bias"] = _t(p["dw"]["b"])
    _conv_to(sd, f"{name}.dConv.1", p["pw"])


def _rdb_to(sd, name, p, cfg: LPSRConfig):
    for i, lp in enumerate(p["layers"]):
        _conv_to(sd, f"{name}.layers.{i}.conv", lp)
    _conv_to(sd, f"{name}.lff", p["lff"])
    sd[f"{name}.alpha"] = _t(np.asarray(p["alpha"]).reshape(())).reshape(())


def _csar_to(sd, name, p):
    _conv_to(sd, f"{name}.conv_in.0", p["conv_in0"])
    _conv_to(sd, f"{name}.conv_in.2", p["conv_in1"])
    import torch

    sd[f"{name}.ca.block.2.weight"] = _t(np.asarray(p["ca_fc1"]["w"]).T)
    sd[f"{name}.ca.block.2.bias"] = _t(p["ca_fc1"]["b"])
    sd[f"{name}.ca.block.4.weight"] = _t(np.asarray(p["ca_fc2"]["w"]).T)
    sd[f"{name}.ca.block.4.bias"] = _t(p["ca_fc2"]["b"])
    _conv_to(sd, f"{name}.sa.block.0", p["sa_conv1"])
    _conv_to(sd, f"{name}.sa.block.2", p["sa_conv2"])
    _conv_to(sd, f"{name}.conv_out", p["conv_out"])


def lpsr_to_torch_state_dict(params: Any,
                             cfg: LPSRConfig = LPSRConfig()) -> Dict:
    """Native LPSR params -> the reference's exact state-dict layout
    (2*num_blocks rdbs entries: even = real RDBs (dead ones zero-filled),
    odd = copies of the shared CSAR)."""
    sd: Dict[str, Any] = {}
    ae = params["auto_encoder"]
    _conv_to(sd, "auto_encoder.conv_in", ae["conv_in"], bias=False)
    _dw_to(sd, "auto_encoder.encoder.0", ae["enc0"])
    _dw_to(sd, "auto_encoder.encoder.3", ae["enc1"])
    _dw_to(sd, "auto_encoder.decoder.0", ae["dec0"])
    _dw_to(sd, "auto_encoder.decoder.3", ae["dec1"])
    _conv_to(sd, "auto_encoder.conv_out", ae["conv_out"], bias=False)
    # the reference registers encoder/decoder AGAIN inside ``GA = Sequential(
    # encoder, decoder)`` (my_models/lpsr.py:98-101), duplicating their keys
    _dw_to(sd, "auto_encoder.GA.0.0", ae["enc0"])
    _dw_to(sd, "auto_encoder.GA.0.3", ae["enc1"])
    _dw_to(sd, "auto_encoder.GA.1.0", ae["dec0"])
    _dw_to(sd, "auto_encoder.GA.1.3", ae["dec1"])

    r = params["rdn"]
    _conv_to(sd, "rdn.shallowF1", r["shallowF1"])
    _conv_to(sd, "rdn.shallowF2", r["shallowF2"])
    _csar_to(sd, "rdn.csar", r["csar"])
    import jax

    zero_rdb = jax.tree.map(lambda a: np.zeros_like(np.asarray(a)),
                            r["rdbs"][0])
    for i in range(cfg.num_blocks):
        idx = 2 * i
        # executed RDBs sit at even indices 0, 2; 4, 6 are dead (zero-fill)
        src = r["rdbs"][i] if i < len(r["rdbs"]) else zero_rdb
        _rdb_to(sd, f"rdn.rdbs.{idx}", src, cfg)
        _csar_to(sd, f"rdn.rdbs.{idx + 1}", r["csar"])
    _conv_to(sd, "rdn.gff.0", r["gff0"])
    _conv_to(sd, "rdn.gff.1", r["gff1"])
    _conv_to(sd, "final_conv", params["final_conv"])
    return sd


def save_lpsr_torch(path: str, params: Any,
                    cfg: LPSRConfig = LPSRConfig()) -> None:
    import torch

    torch.save(lpsr_to_torch_state_dict(params, cfg), path)
