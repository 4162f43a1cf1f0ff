"""Auto-resume test: kill a run mid-way, restart, verify continuation."""
import numpy as np
import pytest

from uurg_tpu.data import synthetic_dataset
from uurg_tpu.workloads import ddpm_runner as R
from tests.test_ddpm_pipeline import TINY_CFG, _args


@pytest.mark.slow
def test_sfron_resume_continues_from_saved_step(tmp_path, monkeypatch):
    monkeypatch.setattr(R, "_load_train_dataset",
                        lambda a, c: synthetic_dataset(64, 8, 3, 4))
    args = _args(tmp_path)
    cfg = TINY_CFG.replace()
    cfg.training.n_iters = 3
    ckpt_dir = str(tmp_path / "ckpts")
    cfg.ckpt_dir = ckpt_dir

    # first run: 3 iters, writes full train_state at the end
    state1 = R.sfron_forget(args, cfg, ckpt_dir)
    assert int(state1.step) == 3

    # second run with a larger budget resumes at step 3 instead of 0
    cfg.training.n_iters = 5
    state2 = R.sfron_forget(args, cfg, ckpt_dir)
    assert int(state2.step) == 5
    # params actually moved in the resumed segment
    import jax

    a = jax.tree_util.tree_leaves(state1.params)[0]
    b = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_load_params_accepts_run_dir_and_ckpts_dir(tmp_path, monkeypatch):
    """--ckpt_folder may point at the run dir root (reference semantics),
    the ckpts/ subdir, or the Orbax ckpt dir itself — all must resolve to
    the same saved params (regression: run-dir root silently fell back to
    fresh init)."""
    import jax
    import numpy as np

    from uurg_tpu.workloads.ddpm import DDPMWorkload

    monkeypatch.setattr(R, "_load_train_dataset",
                        lambda a, c: synthetic_dataset(64, 8, 3, 4))
    args = _args(tmp_path)
    cfg = TINY_CFG.replace()
    cfg.training.n_iters = 2
    run_dir = tmp_path / "run"
    ckpt_dir = str(run_dir / "ckpts")
    cfg.ckpt_dir = ckpt_dir
    R.sfron_forget(args, cfg, ckpt_dir)

    wl = DDPMWorkload.from_config(cfg)
    ref = None
    for candidate in (str(run_dir), ckpt_dir, str(run_dir / "ckpts" / "ckpt")):
        args.ckpt_folder = candidate
        params = R.load_params(args, cfg, wl)
        leaf = np.asarray(jax.tree_util.tree_leaves(params)[0])
        if ref is None:
            ref = leaf
        else:
            np.testing.assert_array_equal(leaf, ref)

    # missing dir still falls back to fresh init (warns, no crash)
    args.ckpt_folder = str(tmp_path / "nonexistent")
    fresh = R.load_params(args, cfg, wl)
    assert not np.array_equal(
        np.asarray(jax.tree_util.tree_leaves(fresh)[0]), ref)


def test_resolve_checkpoint_dir_layouts(tmp_path):
    """Fast unit check of the shared resolver (io/checkpoint.py): checkpoint
    dir itself, run dir with ckpts/ckpt, save_path parent with exactly one
    checkpoint subdir, and a no-match passthrough."""
    from uurg_tpu.io.checkpoint import resolve_checkpoint_dir

    def mk_ckpt(p):
        p.mkdir(parents=True)
        (p / "_CHECKPOINT_METADATA").write_text("{}")
        return str(p)

    direct = mk_ckpt(tmp_path / "a" / "ckpt_dir")
    assert resolve_checkpoint_dir(direct) == direct

    run = tmp_path / "run"
    nested = mk_ckpt(run / "ckpts" / "ckpt")
    assert resolve_checkpoint_dir(str(run)) == nested

    parent = tmp_path / "probe"
    single = mk_ckpt(parent / "cifar10_resnet34")
    assert resolve_checkpoint_dir(str(parent)) == single

    # two checkpoint subdirs: ambiguous, passthrough unchanged
    mk_ckpt(parent / "second")
    assert resolve_checkpoint_dir(str(parent)) == str(parent)

    missing = str(tmp_path / "nope")
    assert resolve_checkpoint_dir(missing) == missing

    # auxiliary checkpoints (fisher/mask artifacts) never win the
    # single-subdir scan: an SA run dir holds fisher_dict NEXT TO the train
    # state, and load_params must not resolve to the fisher (regression:
    # test_sa_forget_runs KeyError 'params')
    sa_run = tmp_path / "sa_run"
    mk_ckpt(sa_run / "fisher_dict")
    state = mk_ckpt(sa_run / "state")
    assert resolve_checkpoint_dir(str(sa_run)) == state

    # a dir holding ONLY aux checkpoints passes through unchanged
    fdir = tmp_path / "fishers"
    mk_ckpt(fdir / "forget_fisher")
    assert resolve_checkpoint_dir(str(fdir)) == str(fdir)
