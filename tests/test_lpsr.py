"""LPSR parity and shape tests (golden oracle: reference torch forward on
weights/best_model.pth — see tools/make_golden.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.models.lpsr import LPSRConfig, load_lpsr, lpsr_apply, lpsr_init

from .conftest import REF_LPSR, requires_ref


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@requires_ref
def test_lpsr_parity_vs_reference(lpsr_golden):
    cfg = LPSRConfig()
    params = load_lpsr(REF_LPSR, cfg)
    x = nchw_to_nhwc(lpsr_golden["x"])  # (2, 32, 192, 3)
    y_ref = nchw_to_nhwc(lpsr_golden["y"])  # (2, 32, 192, 1)
    y = jax.jit(lambda p, x: lpsr_apply(p, x, cfg))(params, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == y_ref.shape
    diff = np.abs(y - y_ref).max()
    assert diff < 2e-5, f"max abs diff {diff}"


@requires_ref
def test_lpsr_param_count():
    """Executed-graph params = 310,277 total minus the ~86K dead tensors
    (SURVEY.md §2.1): rdbs 4..7 never run and odd entries share the CSAR."""
    params = load_lpsr(REF_LPSR)
    n = sum(int(np.asarray(v).size) for v in jax.tree.leaves(params))
    # executed subgraph only: base 35,137 + 2 live RDBs (35,425 each) +
    # 1 shared CSAR (25,320) = 131,307.  The torch checkpoint's 310,277
    # includes 2 dead RDBs and 4 duplicate references to the shared CSAR.
    assert n == 131_307


def test_lpsr_random_init_shapes():
    cfg = LPSRConfig(out_channels=3)
    params = lpsr_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 32, 192, 3))
    y = jax.jit(lpsr_apply, static_argnums=2)(params, x, cfg)
    assert y.shape == (1, 32, 192, 3)
    assert bool(jnp.all((y >= 0) & (y <= 1)))


def test_lpsr_pads_non_multiple_of_4():
    cfg = LPSRConfig()
    params = lpsr_init(jax.random.PRNGKey(1), cfg)
    y = jax.jit(lpsr_apply, static_argnums=2)(params, jnp.zeros((1, 30, 190, 3)), cfg)
    # AutoEncoder pads bottom/right to multiples of 4 (reference
    # my_models/lpsr.py:107-111); trailing layers keep the padded size.
    assert y.shape == (1, 32, 192, 1)


def test_lpsr_batched_vmap_consistency():
    cfg = LPSRConfig()
    params = lpsr_init(jax.random.PRNGKey(2), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 192, 3))
    f = jax.jit(lpsr_apply, static_argnums=2)
    y_batch = f(params, x, cfg)
    y_single = jnp.concatenate(
        [f(params, x[i : i + 1], cfg) for i in range(4)], axis=0
    )
    np.testing.assert_allclose(
        np.asarray(y_batch), np.asarray(y_single), atol=1e-5, rtol=1e-5
    )


def test_lpsr_variants():
    """Experimental architecture variants (reference experiments/ver01-03)."""
    from lpr_tpu.models.lpsr_variants import (
        VariantConfig,
        ver01_apply,
        ver01_init,
        ver02_apply,
        ver02_init,
        ver03_apply,
        ver03_init,
    )

    cfg = VariantConfig(num_features=8, growth_rate=4, num_blocks=2,
                        num_layers=2, scale_factor=2)
    x = jnp.zeros((1, 16, 48, 3))
    for init, apply in ((ver01_init, ver01_apply), (ver02_init, ver02_apply),
                        (ver03_init, ver03_apply)):
        p = init(jax.random.PRNGKey(0), cfg)
        y = jax.jit(apply)(p, x)
        assert y.shape == (1, 32, 96, 3)  # 2x upscale
    # ver02/03 outputs are sigmoid-bounded
    p = ver03_init(jax.random.PRNGKey(1), cfg)
    y = jax.jit(ver03_apply)(p, jnp.ones((1, 16, 48, 3)))
    assert bool(jnp.all((y > 0) & (y < 1)))
