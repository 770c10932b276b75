"""autobatch / evolve / guards / config / plots / TTA tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpr_tpu.utils.autobatch import autobatch, traced_bytes
from lpr_tpu.utils.evolve import META, evolve, mutate
from lpr_tpu.utils.guards import StepGuard, auto_resume_latest, tree_all_finite


def test_traced_bytes_counts():
    def f(x):
        return (x @ x).sum()

    x = jax.ShapeDtypeStruct((128, 128), np.float32)
    peak, out = traced_bytes(f, x)
    assert peak >= 128 * 128 * 4 * 2
    assert out == 4


def test_traced_bytes_counts_skip_connection_liveness():
    """A residual held across a chain of ops must be counted for its whole
    lifetime (the round-4 fix: the old max-single-equation estimate missed
    this and under-counted yolov5s @640 by ~2x vs compiled memory_analysis;
    see tools/validate_autobatch.py)."""
    n = 256 * 256  # 256 KiB per f32 buffer

    def f(x):
        y = x * 2.0            # residual, read again at the end
        z = jnp.tanh(y)
        w = jnp.tanh(z)
        v = jnp.tanh(w)
        return y + v

    x = jax.ShapeDtypeStruct((n,), np.float32)
    peak, _ = traced_bytes(f, x)
    # at the `v = tanh(w)` equation the live set is {x? no — freed}, y, w, v
    # = 3 buffers + the input already freed; with the input's early
    # lifetime, peak must be at least 3 buffers
    assert peak >= 3 * n * 4


def test_autobatch_small_model():
    from lpr_tpu.models.lpsr import LPSRConfig, lpsr_apply, lpsr_init

    cfg = LPSRConfig(num_features=8, growth_rate=4, num_blocks=2, num_layers=2)
    params = lpsr_init(jax.random.PRNGKey(0), cfg)
    b = autobatch(lambda p, x: lpsr_apply(p, x, cfg), params, (32, 192, 3))
    assert b >= 8  # tiny model: big batches fit v5e HBM
    b2 = autobatch(lambda p, x: lpsr_apply(p, x, cfg), params, (32, 192, 3),
                   hbm_bytes=64 * 1024 * 1024)
    assert b2 < b


def test_mutate_respects_bounds():
    import random

    hyp = {k: (lo + hi) / 2 for k, (g, lo, hi) in META.items()}
    rng = random.Random(0)
    for _ in range(20):
        m = mutate(hyp, rng)
        for k, v in m.items():
            g, lo, hi = META[k]
            assert lo - 1e-9 <= v <= hi + 1e-9


def test_evolve_improves():
    # fitness peaked at lr0=0.05
    def fit(h):
        return -abs(h["lr0"] - 0.05)

    best, best_fit = evolve({"lr0": 0.005}, fit, generations=40, seed=1)
    assert best_fit > -abs(0.005 - 0.05)  # improved over the start


def test_tree_all_finite():
    assert bool(tree_all_finite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
    assert not bool(tree_all_finite({"a": jnp.asarray([1.0, np.nan])}))


def test_step_guard():
    g = StepGuard(max_consecutive=3)
    assert g.check(1.0)
    assert not g.check(float("nan"))
    assert not g.check(float("inf"))
    with pytest.raises(FloatingPointError):
        g.check(float("nan"))


def test_auto_resume_latest(tmp_path):
    assert auto_resume_latest(str(tmp_path)) is None
    (tmp_path / "a.npz").write_bytes(b"x")
    import time

    time.sleep(0.01)
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.npz").write_bytes(b"y")
    assert auto_resume_latest(str(tmp_path)).endswith("b.npz")


def test_config_roundtrip(tmp_path):
    from lpr_tpu.config import load_config, save_config
    from lpr_tpu.models.lpsr import LPSRConfig

    cfg = LPSRConfig(num_features=16, out_channels=3)
    p = str(tmp_path / "lpsr.yaml")
    save_config(p, cfg)
    loaded = load_config(p)
    assert isinstance(loaded, LPSRConfig)
    assert loaded.num_features == 16 and loaded.out_channels == 3


def test_plots(tmp_path):
    from lpr_tpu.eval.plots import plot_confusion_matrix, plot_labels, plot_pr_curve

    r = np.linspace(0, 1, 11)
    fig = plot_pr_curve(r, {"all": 1 - r}, str(tmp_path / "pr.png"))
    if fig is not None:
        assert os.path.exists(tmp_path / "pr.png")
    m = np.eye(3)
    plot_confusion_matrix(m, ["a", "b"], str(tmp_path / "cm.png"))
    plot_labels(np.asarray([[0, 0.5, 0.5, 0.2, 0.2]]),
                str(tmp_path / "labels.png"))


def test_tta_augmented_inference():
    from lpr_tpu.models.yolo import apply_augmented, yolov5

    model = yolov5("n", nc=3)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    pred = jax.jit(lambda p, x: apply_augmented(model, p, x))(params, x)
    assert pred.ndim == 3 and pred.shape[-1] == 8
    # more candidates than a single pass but clipped tails
    single, _ = model.apply(params, x)
    assert pred.shape[1] > single.shape[1]
