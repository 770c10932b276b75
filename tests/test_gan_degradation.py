"""CycleGAN models/trainer + degradation synthesis tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.data.degradation import (
    DegradationConfig,
    LPDegradation,
    apply_kernel,
    motion_kernel,
)
from lpr_tpu.data.image_pool import ImagePool
from lpr_tpu.models.cyclegan import (
    GeneratorConfig,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
)

TINY_GEN = GeneratorConfig(n_resnet_blocks=2, base=8)


def test_generator_shapes():
    p = generator_init(jax.random.PRNGKey(0), TINY_GEN)
    x = jnp.zeros((2, 32, 64, 3))
    y = jax.jit(generator_apply)(p, x)
    assert y.shape == (2, 32, 64, 3)
    assert bool(jnp.all(jnp.abs(y) <= 1.0))


def test_discriminator_patch_output():
    p = discriminator_init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))
    y, p2 = jax.jit(lambda p, x: discriminator_apply(p, x, update_sn=True))(p, x)
    # 64 -> 32 -> 16 -> 8 (3 stride-2) -> 7 -> 6 (two stride-1 k4 p1)
    assert y.shape == (2, 6, 6, 1)
    # power iteration vector updated
    assert not np.allclose(np.asarray(p["convs"][0]["u"]),
                           np.asarray(p2["convs"][0]["u"]))


def test_spectral_norm_bounds_singular_value():
    from lpr_tpu.models.cyclegan import _spectral_normalize

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(4, 4, 8, 16).astype(np.float32) * 3)
    u = jnp.asarray(rng.randn(16).astype(np.float32))
    wn = w
    for _ in range(20):
        wn_, u = _spectral_normalize(w, u)
    wn = np.asarray(wn_).reshape(-1, 16)
    s = np.linalg.svd(wn, compute_uv=False)
    assert abs(s[0] - 1.0) < 1e-2


def test_cyclegan_train_step_runs():
    from lpr_tpu.train.cyclegan import CycleGANConfig, CycleGANTrainer

    tr = CycleGANTrainer(CycleGANConfig(), TINY_GEN)
    state = tr.init(jax.random.PRNGKey(0))
    a = jnp.zeros((2, 32, 32, 3))
    b = jnp.ones((2, 32, 32, 3)) * 0.5
    state, m = tr.step(state, a, b)
    assert np.isfinite(m["g_loss"]) and np.isfinite(m["d_a_loss"])
    state, m2 = tr.step(state, a, b)
    assert np.isfinite(m2["g_loss"])


def test_image_pool():
    pool = ImagePool(4, seed=0)
    first = np.arange(4 * 2 * 2 * 3, dtype=np.float32).reshape(4, 2, 2, 3)
    out = pool.query(first)
    np.testing.assert_array_equal(out, first)  # pool filling: passthrough
    second = first + 100
    out2 = pool.query(second)
    assert out2.shape == first.shape
    # each output row is either the new image or an old one
    for img in out2:
        assert (img >= 100).all() or (img < 100).all()


def test_motion_kernel_normalized():
    k = jax.jit(motion_kernel)(jax.random.PRNGKey(3))
    k = np.asarray(k)
    assert k.shape == (13, 13)
    assert abs(k.sum() - 1.0) < 1e-5
    assert (k >= 0).all()


def test_degradation_batch():
    deg = LPDegradation(DegradationConfig(lr_hw=(32, 192)), hr_hw=(64, 384))
    hr = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 384, 3))
    lr = deg(jax.random.PRNGKey(1), hr)
    lr = np.asarray(lr)
    assert lr.shape == (4, 32, 192, 3)
    assert lr.min() >= 0 and lr.max() <= 1
    # stochastic: two keys differ
    lr2 = np.asarray(deg(jax.random.PRNGKey(2), hr))
    assert not np.allclose(lr, lr2)


def test_apply_kernel_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (16, 24, 3))
    ident = jnp.zeros((5, 5)).at[2, 2].set(1.0)
    out = jax.jit(apply_kernel)(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
