"""Data layer tests: splits, batchers, transforms."""
import numpy as np
import pytest

from uurg_tpu.core.config import Config
from uurg_tpu.data import (
    ArrayDataset,
    class_forget_split,
    data_transform,
    epoch_batches,
    infinite_batches,
    inverse_data_transform,
    random_forget_split,
    synthetic_dataset,
)


def test_class_forget_split():
    ds = synthetic_dataset(n=200, n_classes=10, seed=0)
    remain, forget = class_forget_split(ds, label_to_forget=3)
    assert len(remain) + len(forget) == 200
    assert np.all(forget.labels == 3)
    assert np.all(remain.labels != 3)


def test_random_forget_split_persists(tmp_path):
    ds = synthetic_dataset(n=100, seed=0)
    r1, f1 = random_forget_split(ds, 0.1, seed=7, save_path=str(tmp_path))
    r2, f2 = random_forget_split(ds, 0.1, seed=99, save_path=str(tmp_path))
    # second call must reuse the persisted indices regardless of seed
    np.testing.assert_array_equal(f1.labels, f2.labels)
    np.testing.assert_array_equal(f1.images, f2.images)
    assert len(f1) == 10


def test_incremental_random_split_cumulative(tmp_path):
    from uurg_tpu.data import incremental_random_split

    ds = synthetic_dataset(n=100, seed=0)
    stages = incremental_random_split(ds, 0.2, 4, seed=3,
                                      save_path=str(tmp_path))
    assert [len(f) for _, f in stages] == [5, 10, 15, 20]
    # cumulative: stage i's forget set contains stage i-1's
    f1 = set(map(tuple, stages[0][1].images.reshape(5, -1)[:, :4]))
    f2 = set(map(tuple, stages[1][1].images.reshape(10, -1)[:, :4]))
    assert f1 <= f2


def test_infinite_batches_shapes_and_reshuffle():
    ds = synthetic_dataset(n=64, seed=0)
    it = infinite_batches(ds, 16, seed=0)
    x, y = next(it)
    assert x.shape == (16, 32, 32, 3) and y.shape == (16,)
    assert x.dtype == np.float32 and 0.0 <= x.min() and x.max() <= 1.0
    batches = [next(it)[1] for _ in range(8)]  # crosses an epoch boundary
    assert len({tuple(b.tolist()) for b in batches}) > 1


def test_infinite_batches_process_sharding():
    ds = synthetic_dataset(n=64, seed=0)
    full = next(infinite_batches(ds, 16, seed=3))
    shard0 = next(infinite_batches(ds, 16, seed=3, process_index=0,
                                   process_count=4))
    shard1 = next(infinite_batches(ds, 16, seed=3, process_index=1,
                                   process_count=4))
    assert shard0[0].shape[0] == 4 and shard1[0].shape[0] == 4
    np.testing.assert_array_equal(shard0[1], full[1][0::4])
    np.testing.assert_array_equal(shard1[1], full[1][1::4])


def test_epoch_batches_covers_dataset():
    ds = synthetic_dataset(n=50, seed=0)
    seen = sum(len(y) for _, y in epoch_batches(ds, 16))
    assert seen == 50


def test_rand_augment_batch():
    from uurg_tpu.data import rand_augment_batch

    rng = np.random.default_rng(0)
    x = rng.random((8, 16, 16, 3)).astype(np.float32)
    out = rand_augment_batch(x, np.random.default_rng(1))
    assert out.shape == x.shape
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert not np.allclose(out, x)
    # deterministic given the rng state
    out2 = rand_augment_batch(x, np.random.default_rng(1))
    np.testing.assert_array_equal(out, out2)


def test_data_transform_roundtrip():
    import jax.numpy as jnp

    cfg = Config({"data": {"rescaled": True}})
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 3).astype(np.float32))
    z = data_transform(cfg, x)
    assert float(z.min()) >= -1.0 and float(z.max()) <= 1.0
    back = inverse_data_transform(cfg, z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_infinite_batches_dataset_smaller_than_batch():
    """Regression: a forget split smaller than the batch size must still
    yield (wrap-around); the stream previously spun forever (found as a
    silent hang of the classification CLI on TPU)."""
    from uurg_tpu.data.arrays import ArrayDataset, infinite_batches

    ds = ArrayDataset(np.arange(5 * 4 * 4 * 3, dtype=np.uint8)
                      .reshape(5, 4, 4, 3) % 255,
                      np.arange(5, dtype=np.int64))
    it = infinite_batches(ds, 8, seed=0)
    x, y = next(it)
    assert x.shape == (8, 4, 4, 3) and y.shape == (8,)
    assert set(np.unique(y)) == {0, 1, 2, 3, 4}  # every sample present
    x2, y2 = next(it)
    assert x2.shape == (8, 4, 4, 3)
