"""Classical degradation model unit tests (lpr_tpu/data/degradation.py).

Reference chain: my_models/degradation.py (motion kernels, lighting,
gaussian blur, bicubic downscale, noise).  The localized glare blob is a
repo extension (concentrated single-character damage; see EVAL.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.data.degradation import (DegradationConfig, LPDegradation,
                                      glare_blob)


def test_glare_blob_is_local_and_brightening():
    img = jnp.full((64, 384, 3), 0.4, jnp.float32)
    out = glare_blob(jax.random.PRNGKey(3), img, (0.35, 0.60), (0.55, 0.95))
    d = np.asarray(out - img)
    # strictly brightens (screen toward white), never darkens
    assert d.min() >= -1e-6
    assert d.max() > 0.25
    # localized: the blob's meaningful support covers roughly one character
    # cell, far less than half the plate
    frac = (d[..., 0] > 0.05).mean()
    assert 0.002 < frac < 0.25


def test_p_glare_zero_matches_legacy_chain():
    hr = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 384, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)
    base = LPDegradation(DegradationConfig(), hr_hw=(64, 384))(key, hr)
    off = LPDegradation(DegradationConfig(p_glare=0.0), hr_hw=(64, 384))(
        key, hr)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))


def test_p_glare_one_changes_output_but_keeps_range():
    hr = jnp.asarray(
        np.random.RandomState(1).rand(4, 64, 384, 3).astype(np.float32))
    key = jax.random.PRNGKey(11)
    base = np.asarray(
        LPDegradation(DegradationConfig(), hr_hw=(64, 384))(key, hr))
    glared = np.asarray(
        LPDegradation(DegradationConfig(p_glare=1.0), hr_hw=(64, 384))(
            key, hr))
    assert np.abs(glared - base).max() > 0.05
    assert glared.min() >= 0.0 and glared.max() <= 1.0
