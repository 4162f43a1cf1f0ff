"""Lazy/sharded data paths (DiT ImageNet-256 scale: DiT/unlearn_dataset.py
TargetedImageFolder + shard-streamed latents)."""
import numpy as np
import pytest

from uurg_tpu.data import class_forget_split
from uurg_tpu.data.arrays import epoch_batches, infinite_batches
from uurg_tpu.data.lazy import (
    LazyImageFolder,
    list_latent_shards,
    sharded_latent_batches,
    write_latent_shards,
)


def _make_folder(tmp_path, n_per_class=6, classes=("c0", "c1", "c2"),
                 size=16):
    from PIL import Image

    rng = np.random.default_rng(0)
    for ci, c in enumerate(classes):
        d = tmp_path / c
        d.mkdir()
        for i in range(n_per_class):
            arr = np.full((size, size, 3), 40 * ci + i, np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(tmp_path)


def test_lazy_folder_matches_eager(tmp_path):
    from uurg_tpu.data.datasets import load_image_folder

    root = _make_folder(tmp_path)
    lazy = LazyImageFolder(root, 16)
    eager = load_image_folder(root, 16)
    assert len(lazy) == len(eager) == 18
    np.testing.assert_array_equal(lazy.labels, eager.labels)
    x, y = lazy.get_batch(np.asarray([0, 7, 17]))
    np.testing.assert_allclose(
        x, eager.images_f32()[[0, 7, 17]], atol=1e-6)


def test_lazy_folder_global_class_map(tmp_path):
    root = _make_folder(tmp_path)
    only_c2 = LazyImageFolder(root, 16, class_names=["c2"])
    assert set(only_c2.labels) == {2}  # global index preserved


def test_lazy_folder_split_and_batchers(tmp_path):
    root = _make_folder(tmp_path)
    ds = LazyImageFolder(root, 16)
    remain, forget = class_forget_split(ds, 1)
    assert len(forget) == 6 and len(remain) == 12
    batches = list(epoch_batches(remain, 5))
    assert sum(len(b[0]) for b in batches) == 12
    it = infinite_batches(forget, 4, seed=0)
    x, y = next(it)
    assert x.shape == (4, 16, 16, 3) and (y == 1).all()


def _fake_latent_batches(n, d=4, bs=8, seed=0):
    rng = np.random.default_rng(seed)
    for s in range(0, n, bs):
        k = min(bs, n - s)
        yield (rng.normal(size=(k, d, d, 4)).astype(np.float32),
               rng.integers(0, 5, k))


def test_write_and_list_shards(tmp_path):
    paths = write_latent_shards(str(tmp_path / "lat"),
                                _fake_latent_batches(50), shard_size=16)
    assert len(paths) == 4  # 16/16/16/2 given bs=8 flush granularity
    assert list_latent_shards(str(tmp_path)) == sorted(paths)
    assert list_latent_shards(str(tmp_path / "lat")) == sorted(paths)
    total = sum(len(np.load(p)["labels"]) for p in paths)
    assert total == 50


def test_sharded_batches_filter_and_shapes(tmp_path):
    paths = write_latent_shards(str(tmp_path / "lat"),
                                _fake_latent_batches(64), shard_size=16)
    it = sharded_latent_batches(paths, 4, seed=1,
                                keep_label=lambda y: y != 2)
    seen = 0
    for _ in range(12):
        x, y = next(it)
        assert x.shape == (4, 4, 4, 4)
        assert (y != 2).all()
        seen += len(y)
    assert seen == 48


def test_sharded_batches_one_epoch_coverage(tmp_path):
    paths = write_latent_shards(str(tmp_path / "lat"),
                                _fake_latent_batches(40), shard_size=10)
    got = sum(len(y) for _, y in sharded_latent_batches(
        paths, 8, seed=0, infinite=False))
    # one epoch, full batches only (tail rolls over / is dropped at end)
    assert got >= 32 and got % 8 == 0


@pytest.mark.slow
def test_dit_fisher_and_forget_over_shards(tmp_path):
    """VERDICT done-criterion: DiT fisher + forget run over a folder that
    streams through shards (synthetic latents, tiny DiT)."""
    import jax
    import jax.numpy as jnp

    from uurg_tpu.workloads.dit import DiTWorkload
    from uurg_tpu.workloads.dit_runner import dit_forget, dit_generate_fisher

    paths = write_latent_shards(str(tmp_path / "lat"),
                                _fake_latent_batches(48, d=4), shard_size=16)

    wl = DiTWorkload.build("DiT-S/2", 32, 5)  # latent 4x4
    params = wl.init_params(jax.random.key(0))

    def dev(it):
        for x, y in it:
            yield jnp.asarray(x), jnp.asarray(y)

    f_it = dev(sharded_latent_batches(paths, 4, seed=0,
                                      keep_label=lambda y: y == 1))
    r_it = dev(sharded_latent_batches(paths, 4, seed=1,
                                      keep_label=lambda y: y != 1))
    out = dit_generate_fisher(wl, params, f_it, r_it, n_iters=2,
                              out_dir=str(tmp_path / "mask"), seed=0)
    assert out

    final = dit_forget(wl, params, f_it, r_it, n_iters=2, lr=1e-4,
                       forget_alpha=1e-3, remain_alpha=1.0,
                       unlearn_loss="ga", method="ron", label_to_forget=1,
                       seed=0, ckpt_dir=str(tmp_path / "ck"), ckpt_freq=100)
    leaves = jax.tree_util.tree_leaves(
        final.params if hasattr(final, "params") else final)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_sd_data_setup_helpers(tmp_path):
    """Reference-named SD data setup (SD/train-scripts/dataset.py:120-176)
    over local folders."""
    from uurg_tpu.data.sd_data import (
        setup_forget_data,
        setup_forget_nsfw_data,
        setup_remain_data,
    )

    (tmp_path / "imagenette").mkdir()
    root = _make_folder(tmp_path / "imagenette", n_per_class=4)
    f_it, desc = setup_forget_data(1, 2, 16, root=root)
    x, y = next(f_it)
    assert x.shape == (2, 16, 16, 3) and (y == 1).all()
    assert x.min() >= -1.0 and x.max() <= 1.0  # [-1,1] signed range
    assert desc == [f"an image of a {c}" for c in ("c0", "c1", "c2")]
    r_it, _ = setup_remain_data(1, 2, 16, root=root)
    _, ry = next(r_it)
    assert (ry != 1).all()

    # flat nsfw-style folders
    from PIL import Image
    for d in ("nsfw", "notnsfw"):
        (tmp_path / d).mkdir()
        for i in range(3):
            Image.fromarray(np.full((8, 8, 3), i * 20, np.uint8)).save(
                tmp_path / d / f"{i}.png")
    fs, rs = setup_forget_nsfw_data(2, 8, nsfw_root=str(tmp_path / "nsfw"),
                                    remain_root=str(tmp_path / "notnsfw"))
    fx, _ = next(fs)
    rx, _ = next(rs)
    assert fx.shape == (2, 8, 8, 3) and rx.shape == (2, 8, 8, 3)
