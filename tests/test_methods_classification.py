"""End-to-end (tiny) tests for all nine classification unlearning methods."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.data import synthetic_dataset
from uurg_tpu.models.resnet import ResNet, BasicBlock, init_classifier
from uurg_tpu.unlearn.methods.classification import (
    UnlearnContext,
    unlearn_method_registry,
)
from uurg_tpu.workloads.classification import Classifier


def tiny_model():
    return ResNet(stage_sizes=[1, 1], block=BasicBlock, num_classes=4,
                  width=8)


@pytest.fixture(scope="module")
def ctx():
    model = tiny_model()
    params, batch_stats = init_classifier(jax.random.key(0), model,
                                          resolution=8)
    full = synthetic_dataset(96, 8, 3, 4, seed=0)
    retain = full.subset(np.arange(64))
    forget = full.subset(np.arange(64, 96))
    return UnlearnContext(
        classifier=Classifier(model), params=params,
        batch_stats=batch_stats, retain_train=retain, forget_train=forget,
        num_classes=4, batch_size=32, seed=0,
        init_fn=lambda k: init_classifier(k, tiny_model(), resolution=8),
        overrides={"epochs": 1, "n_iters": 6, "forget_freq": 2,
                   "sgda_epochs": 1, "msteps": 1},
    )


def _params_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)))


def test_registry_has_all_nine():
    assert set(unlearn_method_registry.names()) >= {
        "Baseline", "Retrain", "Finetune", "GradAscent", "RandomLabel",
        "BadTeacher", "SCRUB", "SalUn", "SFRon"}


def test_baseline_is_noop(ctx):
    p, bs = unlearn_method_registry.get("Baseline")(ctx)
    assert _params_equal(p, ctx.params)


@pytest.mark.parametrize("name", ["Finetune", "GradAscent", "RandomLabel",
                                  "BadTeacher", "SCRUB", "SalUn", "SFRon"])
def test_method_runs_and_updates(ctx, name):
    p, bs = unlearn_method_registry.get(name)(ctx)
    assert not _params_equal(p, ctx.params), f"{name} did not update params"
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.all(np.isfinite(np.asarray(leaf))), f"{name} non-finite"


def test_retrain_reinitializes(ctx):
    sub = dataclasses.replace(ctx, overrides={"epochs": 1})
    p, bs = unlearn_method_registry.get("Retrain")(sub)
    assert not _params_equal(p, ctx.params)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_sfron_reduces_forget_accuracy_direction(ctx):
    """After brief training to fit, SFRon ascent should push forget-set CE up
    relative to doing nothing (direction check, not a benchmark)."""
    cls = ctx.classifier
    # first overfit a few steps so there is something to forget
    ft = dataclasses.replace(ctx, overrides={"epochs": 2})
    fitted, fitted_bs = unlearn_method_registry.get("Finetune")(ft)
    from uurg_tpu.data.arrays import epoch_batches

    base = cls.validate(fitted, fitted_bs,
                        epoch_batches(ctx.forget_train, 32))
    sfron_ctx = dataclasses.replace(
        ctx, params=fitted, batch_stats=fitted_bs,
        overrides={"n_iters": 12, "forget_freq": 1, "forget_alpha": 50.0,
                   "mask": False})
    p, bs = unlearn_method_registry.get("SFRon")(sfron_ctx)
    after = cls.validate(p, bs, epoch_batches(ctx.forget_train, 32))
    assert after["loss"] > base["loss"], (
        f"forget loss should rise: {base['loss']} -> {after['loss']}")


def test_device_batcher_crop_is_a_valid_crop():
    """The take_along_axis pad-crop must produce, per sample, an actual
    (h, w) window of the 4px-padded (possibly flipped) source image —
    exhaustively checked against every (flip, oy, ox) candidate."""
    from uurg_tpu.unlearn.methods.classification import _device_batcher

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (6, 8, 8, 3), np.uint8)
    labels = np.arange(6, dtype=np.int32)
    draw = _device_batcher(batch_size=5, augment=True)
    x, y = jax.jit(draw)((jnp.asarray(images), jnp.asarray(labels)),
                        jax.random.key(3))
    x, y = np.asarray(x), np.asarray(y)
    assert x.shape == (5, 8, 8, 3) and x.dtype == np.float32
    pad = 4
    for b in range(5):
        src = images[y[b]].astype(np.float32) / 255.0
        found = False
        for flip in (False, True):
            s = src[:, ::-1, :] if flip else src
            sp = np.pad(s, ((pad, pad), (pad, pad), (0, 0)))
            for oy in range(2 * pad + 1):
                for ox in range(2 * pad + 1):
                    if np.allclose(x[b], sp[oy:oy + 8, ox:ox + 8], atol=1e-6):
                        found = True
        assert found, f"sample {b} is not any crop of its source image"


def test_device_batcher_no_augment_matches_source():
    from uurg_tpu.unlearn.methods.classification import _device_batcher

    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (7, 8, 8, 3), np.uint8)
    labels = np.arange(7, dtype=np.int32)
    draw = _device_batcher(batch_size=4, augment=False)
    x, y = jax.jit(draw)((jnp.asarray(images), jnp.asarray(labels)),
                        jax.random.key(0))
    x, y = np.asarray(x), np.asarray(y)
    np.testing.assert_allclose(
        x, images[y].astype(np.float32) / 255.0, atol=1e-6)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_sfron_fisher_cache_saved_and_reused(ctx, tmp_path, monkeypatch):
    """With save_path set, SFRon persists forget/remain fisher checkpoints
    and reuses them on a repeat run without recomputing
    (Classification/unlearn/sfron.py:269-271,296-298 parity)."""
    import uurg_tpu.unlearn.methods.classification as M

    run_ctx = dataclasses.replace(
        ctx, save_path=str(tmp_path),
        overrides={"n_iters": 4, "forget_freq": 2})
    unlearn_method_registry.get("SFRon")(run_ctx)
    from uurg_tpu.io.checkpoint import is_checkpoint_dir

    tag = M._fisher_cache_tag(run_ctx)
    assert is_checkpoint_dir(str(tmp_path / f"forget_fisher_{tag}"))
    assert is_checkpoint_dir(str(tmp_path / f"remain_fisher_{tag}"))

    def boom(*a, **k):
        raise AssertionError("fisher recomputed despite cache")

    monkeypatch.setattr(M, "accumulate_fisher", boom)
    p, bs = unlearn_method_registry.get("SFRon")(run_ctx)
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_sfron_fisher_cache_not_reused_across_splits(ctx, tmp_path,
                                                     monkeypatch):
    """A rerun with a DIFFERENT forget split must not reuse the cached
    fisher: the cache dir is keyed by (seed, split, model) fingerprint."""
    import uurg_tpu.unlearn.methods.classification as M

    a = dataclasses.replace(ctx, save_path=str(tmp_path),
                            overrides={"n_iters": 2, "forget_freq": 2})
    b = dataclasses.replace(
        a, forget_train=ctx.retain_train, retain_train=ctx.forget_train)
    assert M._fisher_cache_tag(a) != M._fisher_cache_tag(b)
    c = dataclasses.replace(a, seed=ctx.seed + 1)
    assert M._fisher_cache_tag(a) != M._fisher_cache_tag(c)
