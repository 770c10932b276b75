"""StableHLO export round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from .conftest import REF_LPSR, requires_ref


@requires_ref
def test_lpsr_stablehlo_roundtrip(tmp_path):
    from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply
    from lpr_tpu.weights.export_stablehlo import export_lpsr, load_fn

    cfg = LPSRConfig()
    params = load_lpsr(REF_LPSR, cfg)
    path = str(tmp_path / "lpsr.stablehlo")
    export_lpsr(params, path, batch=2)

    fn = load_fn(path)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 192, 3))
    y_exp = np.asarray(fn(x))
    y_ref = np.asarray(jax.jit(lambda p, x: lpsr_apply(p, x, cfg))(params, x))
    np.testing.assert_allclose(y_exp, y_ref, atol=1e-5)


def test_detector_stablehlo_roundtrip(tmp_path):
    from lpr_tpu.models.yolo import yolov5
    from lpr_tpu.weights.export_stablehlo import export_detector, load_fn

    model = yolov5("n", nc=3)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "det.stablehlo")
    export_detector(model, params, path, batch=1, hw=(64, 64))
    fn = load_fn(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    y = np.asarray(fn(x))
    pred, _ = model.apply(params, x)
    np.testing.assert_allclose(y, np.asarray(pred), atol=1e-5)
