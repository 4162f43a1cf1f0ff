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
