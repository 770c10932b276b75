"""Torch-export round-trip tests (reference-loadable checkpoints)."""

import numpy as np
import pytest

from .conftest import REF_LPSR, requires_ref


@requires_ref
def test_lpsr_torch_export_roundtrip(tmp_path):
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr
    from lpr_tpu.weights.export_torch import save_lpsr_torch
    from lpr_tpu.weights.torch_ckpt import load_state_dict

    cfg = LPSRConfig()
    params = load_lpsr(REF_LPSR, cfg)
    out = str(tmp_path / "export.pth")
    save_lpsr_torch(out, params, cfg)

    # exact key-set parity with the shipped reference checkpoint
    orig = load_state_dict(REF_LPSR)
    exported = load_state_dict(out)
    assert set(exported) == set(orig)

    # every *live* tensor round-trips bitwise; dead rdbs 4/6 are zero-filled
    for k in orig:
        if k.startswith(("rdn.rdbs.4", "rdn.rdbs.6")):
            assert not np.asarray(exported[k]).any()
        else:
            np.testing.assert_array_equal(
                np.asarray(exported[k]), np.asarray(orig[k]), err_msg=k
            )

    # and re-importing the export reproduces identical params
    p2 = load_lpsr(out, cfg)
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
