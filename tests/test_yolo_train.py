"""YOLO loss + trainer tests: assignment correctness, overfit-a-tiny-batch."""

import jax
import jax.numpy as jnp
import numpy as np

from lpr_tpu.models.yolo import YoloSpec, build_yolo
from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer, EarlyStopping, fitness
from lpr_tpu.train.yolo_loss import (
    YoloLossConfig,
    build_targets_level,
    yolo_loss,
)


def tiny_spec(nc=3):
    backbone = (
        (-1, 1, "Conv", [16, 3, 2]),
        (-1, 1, "Conv", [32, 3, 2]),
        (-1, 1, "C3", [32]),
        (-1, 1, "Conv", [64, 3, 2]),
        (-1, 1, "C3", [64]),
    )
    head = (([4], 1, "Detect", ["nc", "anchors"]),)
    return YoloSpec(nc, 1.0, 1.0, [[10, 10, 30, 30]], backbone, head)


def test_build_targets_center_cell():
    labels = jnp.asarray([[1.0, 0.5, 0.5, 0.25, 0.25],
                          [0.0, 0.0, 0.0, 0.0, 0.0]])  # 1 valid + 1 pad
    anchors = jnp.asarray([[2.0, 2.0]])
    out = build_targets_level(labels, anchors, (8, 8), anchor_t=4.0)
    # target at grid (4.0, 4.0), wh = 2 grid units, ratio 1 -> pass
    m = np.asarray(out["mask"][0, 0])  # (5,) offsets for target 0
    assert m[0]  # center cell always on
    assert not np.asarray(out["mask"][0, 1]).any()  # padded row off everywhere
    gi = np.asarray(out["gi"][0, 0])
    gj = np.asarray(out["gj"][0, 0])
    assert gi[0] == 4 and gj[0] == 4


def test_build_targets_anchor_filter():
    labels = jnp.asarray([[0.0, 0.5, 0.5, 0.5, 0.5]])
    anchors = jnp.asarray([[0.5, 0.5]])  # ratio = 8 > 4 -> filtered
    out = build_targets_level(labels, anchors, (8, 8), anchor_t=4.0)
    assert not np.asarray(out["mask"]).any()


def test_yolo_loss_finite_and_positive():
    model = build_yolo(tiny_spec(), strides=(8,))
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    raws = model.apply(params, x, decode=False)
    labels = jnp.asarray([
        [[0.0, 0.5, 0.5, 0.3, 0.3], [1.0, 0.25, 0.25, 0.2, 0.2]],
        [[2.0, 0.7, 0.6, 0.4, 0.2], [0.0, 0.0, 0.0, 0.0, 0.0]],
    ])
    total, comps = jax.jit(
        lambda r, l: yolo_loss(r, l, jnp.asarray(model.anchors))
    )(raws, labels)
    assert np.isfinite(float(total)) and float(total) > 0
    for k in ("box", "obj", "cls"):
        assert np.isfinite(float(comps[k]))


def test_yolo_loss_empty_labels():
    model = build_yolo(tiny_spec(), strides=(8,))
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    raws = model.apply(params, x, decode=False)
    labels = jnp.zeros((1, 4, 5))
    total, comps = yolo_loss(raws, labels, jnp.asarray(model.anchors))
    assert np.isfinite(float(total))
    assert float(comps["box"]) == 0.0 and float(comps["cls"]) == 0.0


def test_yolo_overfit_tiny():
    """Training on one fixed batch must drive the loss down and make the
    detector find the object."""
    model = build_yolo(tiny_spec(), strides=(8,))
    trainer = YoloTrainer(
        model,
        YoloTrainConfig(lr0=0.02, warmup_epochs=0.0, epochs=10000),
        steps_per_epoch=1,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, 24:40, 16:48] = 1.0  # bright box at cx=.5, cy=.5, w=.5, h=.25
    img += rng.rand(*img.shape).astype(np.float32) * 0.05
    images = jnp.asarray(img)
    labels = jnp.asarray([[[1.0, 0.5, 0.5, 0.5, 0.25]]])
    losses = []
    for _ in range(60):
        state, total, comps = trainer.step(state, images, labels)
        losses.append(float(total))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    # EMA tracked and finite
    leaves = jax.tree.leaves(state["ema"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_early_stopping_and_fitness():
    es = EarlyStopping(patience=2)
    assert not es(0, 0.5)
    assert not es(1, 0.4)
    assert es(2, 0.3)
    assert fitness({"map": 0.5, "map50": 0.7}) == 0.9 * 0.5 + 0.1 * 0.7


def test_train_mode_bn_updates_running_stats():
    """train=True must use batch stats and EMA-update running mean/var."""
    model = build_yolo(tiny_spec(), strides=(8,))
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 3 + 1
    (raws, new_params) = model.apply(params, x, decode=False, train=True)
    old_mean = np.asarray(params[0]["bn"]["mean"])
    new_mean = np.asarray(new_params[0]["bn"]["mean"])
    assert not np.allclose(old_mean, new_mean)
    # weights untouched
    np.testing.assert_array_equal(
        np.asarray(params[0]["w"]), np.asarray(new_params[0]["w"])
    )


def test_fit_yolo_overfit_reaches_map(tmp_path):
    """Tiny fit loop on one synthetic detection task: mAP must become
    non-trivial and checkpoints must be written."""
    from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer, fit_yolo

    model = build_yolo(tiny_spec(nc=2), strides=(8,))
    rng = np.random.RandomState(0)
    imgs = np.zeros((4, 64, 64, 3), np.float32)
    labels = np.zeros((4, 4, 5), np.float32)
    for i in range(4):
        x = 8 + 8 * i
        imgs[i, 24:40, x : x + 16] = 1.0
        labels[i, 0] = [1.0, (x + 8) / 64, 0.5, 0.25, 0.25]
    imgs += rng.rand(*imgs.shape).astype(np.float32) * 0.05

    trainer = YoloTrainer(
        model, YoloTrainConfig(lr0=0.02, warmup_epochs=0.0, epochs=100000),
        steps_per_epoch=1,
    )
    state = fit_yolo(
        trainer,
        lambda: [(imgs, labels)] * 60,
        lambda: [(imgs, labels)],
        epochs=5,
        ckpt_dir=str(tmp_path),
        logger=lambda m: None,
    )
    from lpr_tpu.train.yolo import validate_map

    metrics = validate_map(model, state["ema"], [(imgs, labels)],
                           conf_thres=0.001)
    assert metrics["map50"] > 0.3
    assert (tmp_path / "last.npz").exists()
    assert (tmp_path / "best.npz").exists()


def test_nonfinite_step_is_true_noop():
    """A NaN batch must leave params/momenta/EMA bitwise unchanged (the
    update is gated on finite loss+grads inside the jitted step), and the
    trainer must keep working on the next good batch."""
    model = build_yolo(tiny_spec(), strides=(8,))
    trainer = YoloTrainer(model, YoloTrainConfig(warmup_epochs=0.0),
                          steps_per_epoch=1)
    state = trainer.init(jax.random.PRNGKey(0))
    before = [np.asarray(x).copy() for x in jax.tree.leaves(
        {"params": state["params"], "ema": state["ema"]})]
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32)
    labels = np.zeros((2, 2, 5), np.float32)
    labels[:, 0] = [1.0, 0.5, 0.5, 0.4, 0.4]
    bad = imgs.copy()
    bad[0, 0, 0, 0] = np.nan
    s1, total, _ = trainer.step(state, jnp.asarray(bad), jnp.asarray(labels))
    assert not np.isfinite(float(total))
    after = [np.asarray(x) for x in jax.tree.leaves(
        {"params": s1["params"], "ema": s1["ema"]})]
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(s1["step"]) == 1  # schedule time still advances
    s2, t2, _ = trainer.step(s1, jnp.asarray(imgs), jnp.asarray(labels))
    assert np.isfinite(float(t2))


def test_grad_accumulation_matches_full_batch():
    """accumulate=2 over two half-batches must produce (nearly) the same
    update as one full-batch step (BN batch stats differ slightly)."""
    model = build_yolo(tiny_spec(), strides=(8,))
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 64, 64, 3).astype(np.float32)
    labels = np.zeros((4, 2, 5), np.float32)
    labels[:, 0] = [1.0, 0.5, 0.5, 0.4, 0.4]
    from lpr_tpu.train.yolo import YoloTrainConfig, YoloTrainer

    cfg = YoloTrainConfig(lr0=0.01, warmup_epochs=0.0, epochs=100)
    t1 = YoloTrainer(model, cfg, steps_per_epoch=1)
    t2 = YoloTrainer(model, cfg, steps_per_epoch=1, accumulate=2)
    s1 = t1.init(jax.random.PRNGKey(0))
    s2 = t2.init(jax.random.PRNGKey(0))
    s1, l1, _ = t1.step(s1, jnp.asarray(imgs), jnp.asarray(labels))
    s2, l2, _ = t2.step(s2, jnp.asarray(imgs), jnp.asarray(labels))
    # accumulated loss = sum over micro-batches of per-micro loss (*b each);
    # full-batch loss scales by 4: both represent the same total within BN
    # batch-stat differences
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))

    def split(params):
        """(gradient-updated leaves, BN running-stat leaves)."""
        grads_l, stats_l = [], []
        for path, x in jax.tree_util.tree_flatten_with_path(params)[0]:
            keys = [str(getattr(p, "key", "")) for p in path]
            if np.asarray(x).ndim == 0:
                continue
            if len(keys) >= 2 and keys[-2] == "bn" and keys[-1] in (
                "mean", "var"
            ):
                stats_l.append(np.ravel(x))
            else:
                grads_l.append(np.ravel(x))
        return np.concatenate(grads_l), np.concatenate(stats_l)

    a, a_stats = split(s1["params"])
    b, b_stats = split(s2["params"])
    # gradient-updated parameters agree to first order
    assert np.abs(a - b).max() < 5e-3
    # BN running stats intentionally differ: torch updates them on every
    # micro-batch forward (2 EMA steps here) vs 1 step for the full batch,
    # so the accumulated trainer's stats moved further from init
    init_stats = split(t1.init(jax.random.PRNGKey(0))["params"])[1]
    assert (np.abs(b_stats - init_stats).sum()
            > np.abs(a_stats - init_stats).sum())
