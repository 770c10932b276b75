"""Fused LPSR Pallas kernel — parity tests (interpreter mode on CPU; the
compiled TPU path is exercised by tools/ benchmarking, where it currently
matches XLA within bf16 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.models.lpsr import LPSRConfig, lpsr_apply, lpsr_init
from lpr_tpu.ops.pallas.lpsr_kernel import lpsr_pallas

from .conftest import REF_LPSR, requires_ref


def test_pallas_lpsr_parity_random_weights():
    cfg = LPSRConfig()
    params = lpsr_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 192, 3))
    y_ref = jax.jit(lambda p, x: lpsr_apply(p, x, cfg))(params, x)
    y_pl = lpsr_pallas(params, x, cfg, interpret=True)
    assert y_pl.shape == y_ref.shape
    # kernel computes in bf16 (production dtype); tolerance accordingly
    assert float(jnp.abs(y_pl - y_ref).max()) < 2e-2


@requires_ref
def test_pallas_lpsr_parity_real_weights():
    from lpr_tpu.models.lpsr import load_lpsr

    cfg = LPSRConfig()
    params = load_lpsr(REF_LPSR, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 192, 3))
    y_ref = jax.jit(lambda p, x: lpsr_apply(p, x, cfg))(params, x)
    y_pl = lpsr_pallas(params, x, cfg, interpret=True)
    assert float(jnp.abs(y_pl - y_ref).max()) < 2e-2


def test_pallas_focus_order_roundtrip():
    """k-major unshuffle -> shuffle is the identity."""
    from lpr_tpu.ops.pallas.lpsr_kernel import _pixel_shuffle, _pixel_unshuffle

    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 12, 5))
    y = _pixel_shuffle(_pixel_unshuffle(x, 2), 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-7)
