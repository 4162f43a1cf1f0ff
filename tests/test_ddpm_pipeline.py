"""End-to-end DDPM north-star slice on tiny shapes (CPU):
fisher -> ratio mask -> SFR-on two-phase unlearning -> DDIM sampling.
Mirrors SURVEY.md section 7's 'minimum end-to-end slice'."""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.core.config import Config
from uurg_tpu.data import class_forget_split, synthetic_dataset
from uurg_tpu.workloads import ddpm_runner as R
from uurg_tpu.workloads.ddpm import DDPMWorkload

TINY_CFG = Config({
    "data": {"dataset": "synthetic", "image_size": 8, "channels": 3,
             "n_classes": 4, "rescaled": True, "random_flip": True},
    "model": {"type": "simple", "in_channels": 3, "out_ch": 3, "ch": 8,
              "ch_mult": [1, 2], "num_res_blocks": 1,
              "attn_resolutions": [4], "dropout": 0.0,
              "var_type": "fixedlarge", "resamp_with_conv": True,
              "cond_drop_prob": 0.1, "ema": True, "ema_rate": 0.0001},
    "diffusion": {"beta_schedule": "linear", "beta_start": 1e-4,
                  "beta_end": 2e-2, "num_diffusion_timesteps": 20},
    "training": {"batch_size": 8, "n_iters": 4, "snapshot_freq": 100,
                 "log_freq": 2, "lambd": 0.5},
    "sampling": {"batch_size": 8},
    "optim": {"optimizer": "Adam", "lr": 1e-4, "beta1": 0.9, "eps": 1e-8,
              "weight_decay": 0.0, "amsgrad": False, "grad_clip": 1.0},
})


def _args(tmp_path, **kw):
    a = types.SimpleNamespace(
        seed=0, label_to_forget=0, ckpt_folder="", forget_alpha=5.0,
        remain_alpha=1.0, decay_forget_alpha=True, method="ron",
        unlearn_loss="adaga", mask_path="", cond_scale=1.5)
    for k, v in kw.items():
        setattr(a, k, v)
    return a


@pytest.fixture(scope="module")
def small_data(monkeypatch_module=None):
    return synthetic_dataset(64, 8, 3, 4, seed=0)


@pytest.mark.slow
def test_full_pipeline(tmp_path, small_data, monkeypatch):
    monkeypatch.setattr(R, "_load_train_dataset",
                        lambda a, c: small_data)
    args = _args(tmp_path)

    # 1. fisher + mask
    fisher_dir = str(tmp_path / "mask_0")
    R.generate_fisher(args, TINY_CFG, fisher_dir)
    masks = R.generate_fisher_mask(fisher_dir, [1.0])
    mask = masks[1.0]
    sp = float(np.mean([np.asarray(l).mean()
                        for l in jax.tree_util.tree_leaves(mask)]))
    assert 0.0 <= sp <= 1.0

    # 2. sfron unlearning
    ckpt_dir = str(tmp_path / "ckpts")
    TINY_CFG.ckpt_dir = ckpt_dir
    state = R.sfron_forget(args, TINY_CFG, ckpt_dir)
    assert int(state.step) == TINY_CFG.training.n_iters
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # 3. sampling from the unlearned model
    labels = np.asarray([1, 2, 3, 1])
    imgs = R.sample_images(args, TINY_CFG, state.ema_params, labels,
                           num_steps=5, batch_size=4)
    assert imgs.shape == (4, 8, 8, 3)
    assert imgs.dtype == np.uint8


@pytest.mark.slow
def test_salun_mask_generation(tmp_path, small_data, monkeypatch):
    monkeypatch.setattr(R, "_load_train_dataset",
                        lambda a, c: small_data)
    args = _args(tmp_path)
    out = R.generate_salun_mask(args, TINY_CFG, str(tmp_path / "salun"),
                                [0.5])
    assert out


@pytest.mark.slow
def test_sa_forget_runs(tmp_path, small_data, monkeypatch):
    monkeypatch.setattr(R, "_load_train_dataset",
                        lambda a, c: small_data)
    # build a trivial fisher_dict checkpoint for SA
    from uurg_tpu.core import tree as tr
    from uurg_tpu.io.checkpoint import save_checkpoint

    wl = DDPMWorkload.from_config(TINY_CFG, dtype=jnp.float32)
    params = wl.init_params(jax.random.key(0))
    save_checkpoint(str(tmp_path / "fisher_dict"),
                    tr.tree_zeros_like(params))
    cfg = TINY_CFG.replace()
    cfg.training.gamma = 1.0
    cfg.training.lmbda = 10.0
    args = _args(tmp_path, ckpt_folder=str(tmp_path))
    p = R.sa_forget(args, cfg, str(tmp_path / "sa_ckpts"))
    for leaf in jax.tree_util.tree_leaves(p):
        assert np.all(np.isfinite(np.asarray(leaf)))
