"""DiT runner loop tests (tiny latents, CPU)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion.gaussian import make_diffusion
from uurg_tpu.models.dit import DiT, DiTConfig
from uurg_tpu.workloads import dit_runner
from uurg_tpu.workloads.dit import DiTWorkload

TINY = DiTConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
                 depth=2, num_heads=2, num_classes=10, dtype=jnp.float32)


@pytest.fixture(scope="module")
def wl():
    return DiTWorkload(model=DiT(TINY), cfg=TINY,
                       diffusion=make_diffusion("", 20, learn_sigma=True))


def _batches(key, label):
    z = jax.random.normal(key, (4, 8, 8, 4))
    y = jnp.full((4,), label, jnp.int32)
    return itertools.repeat((z, y))


@pytest.mark.slow
def test_dit_forget_loop(wl, tmp_path):
    params = wl.init_params(jax.random.key(0))
    state = dit_runner.dit_forget(
        wl, params,
        _batches(jax.random.key(1), 0), _batches(jax.random.key(2), 3),
        n_iters=3, lr=1e-4, forget_alpha=1e-2, unlearn_loss="adaga",
        label_to_forget=0, log_freq=100)
    assert int(state.step) == 3
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_dit_fisher_and_mask(wl, tmp_path):
    params = wl.init_params(jax.random.key(0))
    out = dit_runner.dit_generate_fisher(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), n_iters=2, out_dir=str(tmp_path))
    masks = dit_runner.dit_generate_mask(out, [1.0], params)
    leaves = jax.tree_util.tree_leaves(masks[1.0])
    assert all(set(np.unique(np.asarray(l))) <= {0.0, 1.0} for l in leaves)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_sample_fid_latents(wl):
    params = wl.init_params(jax.random.key(0))
    out = dit_runner.dit_sample_fid(
        wl, params, np.asarray([1, 2, 3]), respacing="3", batch_size=2,
        cond_scale=1.5)
    assert out.shape == (3, 8, 8, 4)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_sample_fid_local_device_sharding_matches(wl):
    """batch_size divisible by the local device count -> the label batch
    lands data-sharded over all local chips; numerics must match the
    unsharded sampler (sharding is layout, not math)."""
    assert jax.device_count() == 8
    params = wl.init_params(jax.random.key(0))
    labels = np.arange(8) % 4
    out = dit_runner.dit_sample_fid(
        wl, params, labels, respacing="3", batch_size=8, cond_scale=1.5,
        seed=3)
    sampler = jax.jit(wl.make_sampler(respacing="3", cond_scale=1.5))
    key = jax.random.key(3)
    _, sub = jax.random.split(key)
    ref = sampler(params, jnp.asarray(labels), sub)
    np.testing.assert_allclose(np.asarray(ref), out, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_sample_grid_writes_npz(tmp_path):
    import jax

    from uurg_tpu.workloads.dit import DiTWorkload
    from uurg_tpu.workloads.dit_runner import dit_sample_grid

    wl = DiTWorkload.build("DiT-S/2", 32, 4)
    params = wl.init_params(jax.random.key(0))
    out = dit_sample_grid(wl, params, str(tmp_path / "vis.npz"),
                          n_per_class=1, classes=[0, 1], respacing="4",
                          seed=0)
    d = np.load(out)
    assert d["latents"].shape[0] == 2
    assert list(d["labels"]) == [0, 1]


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_forget_auto_resume(tmp_path):
    """dit_forget resumes from a saved train_state (parity-plus: the
    reference DiT loop is save-only)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from uurg_tpu.workloads.dit import DiTWorkload
    from uurg_tpu.workloads.dit_runner import dit_forget

    wl = DiTWorkload.build("DiT-S/2", 32, 4, dtype=jnp.float32)
    params = wl.init_params(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (4, 4, 4, 4))
    fb = itertools.repeat((z, jnp.zeros((4,), jnp.int32)))
    rb = itertools.repeat((z, jnp.ones((4,), jnp.int32)))

    ck = str(tmp_path / "ck")
    # run 2 steps, train_state saved at ckpt_freq=2
    s1 = dit_forget(wl, params, fb, rb, n_iters=2, lr=1e-4,
                    forget_alpha=1e-2, unlearn_loss="ga",
                    label_to_forget=0, seed=0, ckpt_dir=ck, ckpt_freq=2)
    assert int(s1.step) == 2
    # a fresh call with n_iters=4 must resume at step 2, not restart
    s2 = dit_forget(wl, params, fb, rb, n_iters=4, lr=1e-4,
                    forget_alpha=1e-2, unlearn_loss="ga",
                    label_to_forget=0, seed=0, ckpt_dir=ck, ckpt_freq=100)
    assert int(s2.step) == 4


@pytest.mark.slow
def test_dit_forget_mesh_checkpoint_roundtrip(wl, tmp_path):
    """Checkpoint/resume under a tp mesh: Orbax saves the sharded train
    state (device_get gathers shards host-side), a resumed mesh run
    re-shards and continues, and the result matches an uninterrupted mesh
    run batch-for-batch."""
    from uurg_tpu.parallel import make_mesh

    params = wl.model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))["params"]
    mesh = make_mesh({"data": 2, "model": 4})
    fb, rb = _batches(jax.random.key(1), 0), _batches(jax.random.key(2), 1)
    kw = dict(lr=1e-4, forget_alpha=1e-2, unlearn_loss="ga",
              label_to_forget=0, seed=0, mesh=mesh, parallelism="tp")

    ref = dit_runner.dit_forget(wl, params, fb, rb, n_iters=4, **kw)

    ck = str(tmp_path / "ck")
    dit_runner.dit_forget(wl, params, fb, rb, n_iters=2, ckpt_dir=ck,
                          ckpt_freq=2, **kw)
    s2 = dit_runner.dit_forget(wl, params, fb, rb, n_iters=4, ckpt_dir=ck,
                               ckpt_freq=100, **kw)
    assert int(s2.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_forget_pipeline_parallel_matches_single(tmp_path):
    """End-to-end dit_forget under parallelism='pp' (stage mesh, GPipe
    schedule in the loss forward): params after 3 steps match the plain
    single-device run batch-for-batch."""
    from uurg_tpu.parallel import make_mesh
    from uurg_tpu.workloads.dit import DiTWorkload

    cfg4 = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                     hidden_size=32, depth=4, num_heads=2, num_classes=10,
                     dtype=jnp.float32)

    def mk_wl():
        return DiTWorkload(model=DiT(cfg4), cfg=cfg4,
                           diffusion=make_diffusion("", 20,
                                                    learn_sigma=True))

    wl_ref = mk_wl()
    params = wl_ref.init_params(jax.random.key(0))
    kw = dict(n_iters=3, lr=1e-4, forget_alpha=1e-2, unlearn_loss="adaga",
              label_to_forget=0, seed=0, log_freq=100)
    ref = dit_runner.dit_forget(
        wl_ref, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), **kw)

    wl_pp = mk_wl()
    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    pp = dit_runner.dit_forget(
        wl_pp, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), mesh=mesh, parallelism="pp",
        pp_microbatches=2, **kw)
    assert wl_pp.apply_fn is not None
    assert int(pp.step) == 3
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ref.params),
            jax.tree_util.tree_leaves(pp.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_forget_mesh_grad_accum_matches_single(wl):
    """grad_accum>1 under a data mesh: the stacked batches are
    [grad_accum, B, ...], so the REAL batch axis (dim 1) must shard over
    'data' (P(None, 'data')) while the scanned microbatch axis stays whole
    per device. Regression: sharding dim 0 either crashed (grad_accum not
    divisible by mesh) or silently replicated the batch. The mesh run must
    equal the meshless run batch-for-batch."""
    from uurg_tpu.parallel import make_mesh

    params = wl.init_params(jax.random.key(0))
    kw = dict(n_iters=2, lr=1e-4, forget_alpha=1e-2, unlearn_loss="ga",
              label_to_forget=0, seed=0, log_freq=100, grad_accum=2)
    ref = dit_runner.dit_forget(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), **kw)

    # data=4 does NOT divide grad_accum=2 — the old leading-dim sharding
    # crashed here; the fixed P(None, 'data') placement shards B=4 cleanly
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    dp = dit_runner.dit_forget(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), mesh=mesh, parallelism="dp", **kw)
    assert int(dp.step) == 2
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ref.params),
            jax.tree_util.tree_leaves(dp.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dit_forget_sequence_parallel_matches_single(wl):
    """End-to-end dit_forget under parallelism='sp': every attention in the
    step rides ring attention over the 'seq' mesh axis (dp x sp mesh) and
    the params after 2 steps match the plain single-device run."""
    from uurg_tpu.parallel import make_mesh

    params = wl.init_params(jax.random.key(0))
    kw = dict(n_iters=2, lr=1e-4, forget_alpha=1e-2, unlearn_loss="adaga",
              label_to_forget=0, seed=0, log_freq=100)
    ref = dit_runner.dit_forget(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), **kw)

    mesh = make_mesh({"data": 2, "seq": 4})
    sp = dit_runner.dit_forget(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), mesh=mesh, parallelism="sp", **kw)
    assert int(sp.step) == 2
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ref.params),
            jax.tree_util.tree_leaves(sp.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_dit_forget_sp_requires_seq_axis(wl):
    from uurg_tpu.parallel import make_mesh

    params = wl.init_params(jax.random.key(0))
    with pytest.raises(ValueError, match="seq"):
        dit_runner.dit_forget(
            wl, params, _batches(jax.random.key(1), 0),
            _batches(jax.random.key(2), 3), n_iters=1,
            mesh=make_mesh({"data": 8}), parallelism="sp")


@pytest.mark.slow
def test_dit_forget_memory_policy_knobs(wl):
    """bf16 Adam moments + bit-packed mask run end-to-end and track the
    default-policy run closely (the dots-remat memory recipe)."""
    params = wl.init_params(jax.random.key(0))
    mask = jax.tree_util.tree_map(
        lambda p: jax.random.uniform(jax.random.key(p.size % 97),
                                     p.shape) > 0.3, params)
    kw = dict(n_iters=3, lr=1e-3, forget_alpha=1e-2, unlearn_loss="ga",
              label_to_forget=0, log_freq=100)
    base = dit_runner.dit_forget(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), mask=mask, **kw)
    lomem = dit_runner.dit_forget(
        wl, params, _batches(jax.random.key(1), 0),
        _batches(jax.random.key(2), 3), mask=mask,
        mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16, pack_mask=True, **kw)
    assert int(lomem.step) == 3
    from uurg_tpu.core.tree import PackedMask

    packed_leaves = jax.tree_util.tree_leaves(
        lomem.mask, is_leaf=lambda n: isinstance(n, PackedMask))
    assert all(isinstance(l, PackedMask) for l in packed_leaves)
    # bf16 moments round the Adam update direction a little each step;
    # the runs must stay close relative to how far training moved
    init = wl.init_params(jax.random.key(0))
    div = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree_util.tree_leaves(base.params),
                              jax.tree_util.tree_leaves(lomem.params)))
    moved = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(base.params),
                                jax.tree_util.tree_leaves(init)))
    assert moved > 0
    assert div < 0.25 * moved, (div, moved)


@pytest.mark.slow
def test_dit_fisher_mask_cli_end_to_end(tmp_path):
    """The standalone reference-layout CLIs chain: dit_generate_fisher.py
    writes <mask-path>/<cls>/{forget,remain}_fisher, dit_generate_mask.py
    thresholds them into <mask-path>/<cls>/fisher_<th>
    (DiT/generate_fisher.py:251,291; DiT/generate_mask.py:17-46)."""
    import os
    import subprocess
    import sys

    cli = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cli")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    mask_root = str(tmp_path / "mask")
    out = subprocess.run(
        [sys.executable, os.path.join(cli, "dit_generate_fisher.py"),
         "--model", "DiT-S/8", "--num-classes", "4", "--n-iters", "1",
         "--batch-size", "2", "--forget-class", "0",
         "--mask-path", mask_root],
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.isdir(os.path.join(mask_root, "0", "forget_fisher"))
    assert os.path.isdir(os.path.join(mask_root, "0", "remain_fisher"))

    out = subprocess.run(
        [sys.executable, os.path.join(cli, "dit_generate_mask.py"),
         "--mask-path", mask_root, "--forget-class", "0",
         "--thresholds", "1.0"],
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.isdir(os.path.join(mask_root, "0", "fisher_1.0"))
