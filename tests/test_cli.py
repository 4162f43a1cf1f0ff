"""CLI smoke tests: every entry point parses --help (flag-surface parity)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 19 fresh-interpreter subprocesses

CLI_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cli")

SCRIPTS = [
    "train.py", "sample.py", "evaluator.py", "classifier_evaluation.py",
    "train_classifier.py", "fim.py", "save_base_dataset.py",
    "main_pretrain.py", "main_random.py", "forget.py", "nsfw_removal.py",
    "train_esd.py", "random_label.py", "gradient_ascent.py",
    "proximal_gradient.py", "sd_generate_fisher.py", "generate_images.py",
    "convert_inception.py", "export_torch.py", "compute_fid.py",
    "imageclassify.py", "encode_latents.py", "dit_sample.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(CLI_DIR, script), "--help"],
        capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stderr[-800:]
    assert "usage" in out.stdout.lower()


def test_graft_entry_importable():
    import importlib.util

    path = os.path.join(os.path.dirname(CLI_DIR), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)
