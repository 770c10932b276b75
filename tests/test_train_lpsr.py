"""LPSR trainer tests: loss decreases, plateau logic, DP-mesh parity."""

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.models.lpsr import LPSRConfig
from lpr_tpu.parallel.mesh import make_mesh
from lpr_tpu.train.lpsr import LPSRTrainConfig, LPSRTrainer, psnr

TINY = LPSRConfig(num_features=8, growth_rate=4, num_blocks=2, num_layers=2)


def _batch(key, b=8, h=8, w=16):
    k1, k2 = jax.random.split(key)
    lr = jax.random.uniform(k1, (b, h, w, 3))
    hr = jnp.mean(lr, axis=-1, keepdims=True)
    return lr, hr


def test_psnr():
    x = jnp.zeros((2, 4, 4, 1))
    y = jnp.full((2, 4, 4, 1), 0.1)
    p = psnr(x, y)
    assert p.shape == (2,)
    np.testing.assert_allclose(np.asarray(p), 20.0, atol=1e-4)


def test_train_loss_decreases():
    trainer = LPSRTrainer(LPSRTrainConfig(lr=3e-3), TINY)
    state = trainer.init(jax.random.PRNGKey(0))
    lr_img, hr_img = _batch(jax.random.PRNGKey(1))
    losses = []
    for _ in range(30):
        state, loss = trainer.step(state, lr_img, hr_img)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7


def test_plateau_reduces_lr():
    trainer = LPSRTrainer(LPSRTrainConfig(plateau_patience=1), TINY)
    state = trainer.init(jax.random.PRNGKey(0))
    state = trainer.plateau_update(state, 10.0)   # new best
    assert state["bad_epochs"] == 0
    state = trainer.plateau_update(state, 9.0)    # bad 1
    state = trainer.plateau_update(state, 9.0)    # bad 2 > patience -> reduce
    assert float(state["lr_scale"]) == 0.5


def test_dp_mesh_matches_single_device():
    """DP over the 8-device CPU mesh must produce the same params as
    single-device training (allreduce correctness)."""
    lr_img, hr_img = _batch(jax.random.PRNGKey(2), b=8)

    t1 = LPSRTrainer(LPSRTrainConfig(), TINY)
    s1 = t1.init(jax.random.PRNGKey(3))
    s1, l1 = t1.step(s1, lr_img, hr_img)

    mesh = make_mesh(8)
    t2 = LPSRTrainer(LPSRTrainConfig(), TINY, mesh=mesh)
    s2 = t2.init(jax.random.PRNGKey(3))
    s2, l2 = t2.step(s2, lr_img, hr_img)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    a = jax.tree.leaves(s1["params"])
    b = jax.tree.leaves(s2["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from lpr_tpu.weights.checkpoint import load_params, save_params

    trainer = LPSRTrainer(LPSRTrainConfig(), TINY)
    state = trainer.init(jax.random.PRNGKey(4))
    p = str(tmp_path / "m.npz")
    save_params(p, state["params"])
    loaded = load_params(p, state["params"])
    for x, y in zip(jax.tree.leaves(state["params"]), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
