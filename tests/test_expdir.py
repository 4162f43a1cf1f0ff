"""Run-dir hyperparameter encoding (DDPM/functions/__init__.py:30-91 parity)
and the cli/train.py sfron snapshot sample grids."""
import argparse
import glob
import os
import re
import subprocess
import sys

import pytest
import yaml

from uurg_tpu.core.config import Config
from uurg_tpu.core.expdir import run_dir_for, setup_run_dirs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = Config({
    "data": {"dataset": "CIFAR10"},
    "training": {"lambd": 0.5},
    "optim": {"lr": 0.0001},
})


def _args(**kw):
    ns = argparse.Namespace(mode="sfron", label_to_forget=0,
                            forget_alpha=10.0, remain_alpha=1.0,
                            decay_forget_alpha=True, method="ron",
                            unlearn_loss="adaga")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_sfron_dir_encoding():
    d = run_dir_for(_args(), CFG, exp_root="results")
    parts = d.split(os.sep)
    assert parts[:2] == ["results", "cifar10"]
    assert parts[2] == "forget_0"
    assert parts[3] == "ron_adaga0.5"
    assert parts[4] == "f10.0True_r1.0_lr0.0001"
    assert re.fullmatch(r"\d{4}_\d{2}_\d{2}_\d{6}", parts[5])


def test_non_sfron_forget_dir_encoding():
    d = run_dir_for(_args(mode="sa", forget_alpha=1.0), CFG)
    parts = d.split(os.sep)
    assert parts[2:5] == ["forget_0", "sa", "f1.0_r1.0_lr0.0001"]


def test_pretrain_dir_encoding():
    d = run_dir_for(_args(mode="pretrain"), CFG)
    parts = d.split(os.sep)
    assert parts[1:3] == ["cifar10", "pretrain"]
    assert len(parts) == 4


def test_setup_creates_tree_and_config_dump(tmp_path):
    cfg = Config(CFG.to_dict())
    root = setup_run_dirs(_args(), cfg, exp_root=str(tmp_path))
    assert os.path.isdir(os.path.join(root, "logs"))
    assert os.path.isdir(os.path.join(root, "ckpts"))
    assert cfg.ckpt_dir == os.path.join(root, "ckpts")
    dumped = yaml.safe_load(
        open(os.path.join(root, "logs", "config.yaml")))
    assert dumped["optim"]["lr"] == 0.0001
    assert dumped["args"]["forget_alpha"] == 10.0


TINY_YML = """
data:
    dataset: SYNTH
    image_size: 8
    channels: 3
    n_classes: 4
    rescaled: true
model:
    in_channels: 3
    out_ch: 3
    ch: 8
    ch_mult: [1, 2]
    num_res_blocks: 1
    attn_resolutions: [4]
    dropout: 0.0
    var_type: fixedlarge
    resamp_with_conv: true
    cond_drop_prob: 0.1
    ema: true
    ema_rate: 0.0001
diffusion:
    beta_schedule: linear
    beta_start: 0.0001
    beta_end: 0.02
    num_diffusion_timesteps: 20
training:
    batch_size: 8
    n_iters: 4
    snapshot_freq: 4
    log_freq: 2
    visualization_samples: 4
    lambd: 0.5
sampling:
    batch_size: 8
    last_only: true
optim:
    optimizer: "Adam"
    lr: 0.0001
    beta1: 0.9
    eps: 0.00000001
    weight_decay: 0.0
    amsgrad: false
    grad_clip: 1.0
"""


@pytest.mark.slow
def test_train_cli_sfron_writes_grid(tmp_path):
    """End-to-end: sfron on the tiny config writes the encoded run tree, a
    checkpoint, and a snapshot sample grid (sample_visualization parity)."""
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(TINY_YML)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "train.py"),
         "--config", str(cfg_path), "--mode", "sfron",
         "--exp", str(tmp_path / "results"),
         "--forget_alpha", "1.0", "--remain_alpha", "1.0"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    runs = glob.glob(str(tmp_path / "results" / "synth" / "forget_0"
                         / "ron_adaga0.5" / "*" / "*"))
    assert len(runs) == 1, runs
    root = runs[0]
    assert os.path.exists(os.path.join(root, "logs", "config.yaml"))
    grids = glob.glob(os.path.join(root, "logs", "samples_step*.png"))
    assert grids, os.listdir(os.path.join(root, "logs"))
    assert os.path.exists(os.path.join(root, "ckpts", "ckpt"))
