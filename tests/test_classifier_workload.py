"""Classifier workload unit tests: train/eval steps, validate, logits."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.data import synthetic_dataset
from uurg_tpu.data.arrays import epoch_batches
from uurg_tpu.models.resnet import ResNet, BasicBlock, init_classifier
from uurg_tpu.train import make_optimizer
from uurg_tpu.workloads.classification import Classifier, accuracy, cross_entropy


@pytest.fixture(scope="module")
def _base():
    # init once per module (the jitted init costs ~15s of gate budget on
    # this box), but keep only HOST copies: train steps DONATE their carry,
    # which would delete shared device buffers for later tests
    model = ResNet([1, 1], BasicBlock, num_classes=4, width=8)
    cls = Classifier(model)
    params, bs = init_classifier(jax.random.key(0), model, resolution=8)
    host = jax.tree_util.tree_map(np.asarray, (params, bs))
    ds = synthetic_dataset(64, 8, 3, 4, seed=0)
    return cls, host, ds


@pytest.fixture()
def setup(_base):
    cls, (hp, hb), ds = _base
    params, bs = jax.tree_util.tree_map(jnp.asarray, (hp, hb))
    return cls, params, bs, ds


def test_cross_entropy_and_accuracy():
    logits = jnp.asarray([[10.0, 0, 0], [0, 10.0, 0]])
    labels = jnp.asarray([0, 0])
    assert float(accuracy(logits, labels)) == pytest.approx(50.0)
    per = cross_entropy(logits, labels, keepdim=True)
    assert float(per[0]) < 1e-3 and float(per[1]) > 5.0


def test_train_step_reduces_loss(setup):
    cls, params, bs, ds = setup
    opt = make_optimizer("sgd", 0.1)
    step = cls.make_train_step(opt)
    carry = (params, bs, jax.jit(opt.init)(params),
             jnp.zeros((), jnp.int32))
    batch = next(epoch_batches(ds, 64))
    batch = (jnp.asarray(batch[0]), jnp.asarray(batch[1]))
    losses = []
    key = jax.random.key(1)
    for i in range(8):
        carry, m = step(carry, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_batch_stats_update_during_training(setup):
    cls, params, bs, ds = setup
    opt = make_optimizer("sgd", 0.01)
    step = cls.make_train_step(opt)
    # snapshot BEFORE the step: the carry is donated (buffers deleted)
    before = [np.asarray(l).copy() for l in jax.tree_util.tree_leaves(bs)]
    carry = (params, bs, jax.jit(opt.init)(params),
             jnp.zeros((), jnp.int32))
    batch = next(epoch_batches(ds, 32))
    carry, _ = step(carry, (jnp.asarray(batch[0]), jnp.asarray(batch[1])),
                    jax.random.key(0))
    after = jax.tree_util.tree_leaves(carry[1])
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(before, after))


def test_validate_weighted_average(setup):
    cls, params, bs, ds = setup
    out = cls.validate(params, bs, epoch_batches(ds, 20))
    assert 0.0 <= out["acc"] <= 100.0
    assert np.isfinite(out["loss"])


def test_collect_logits_shapes(setup):
    cls, params, bs, ds = setup
    logits, labels = cls.collect_logits(params, bs, epoch_batches(ds, 16))
    assert logits.shape == (64, 4)
    assert labels.shape == (64,)
