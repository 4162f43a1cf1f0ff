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
    "dit_generate_fisher.py", "dit_generate_mask.py",
    "generate_fisher_mask.py",
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


def test_classifier_evaluation_image_size(tmp_path):
    """Regression: the probe must be evaluated at its TRAINING resolution.

    Round-3 demo bug: cli/classifier_evaluation.py hard-coded the reference's
    224px resize while the probe was trained at 32px — every sample (even
    from the pretrained model) probed at ~0 forget-class probability, erasing
    the directionality signal. --image_size now controls the resize; this
    runs the CLI end-to-end with a 32px probe on on-class images and asserts
    the probe actually recognizes them.
    """
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from uurg_tpu.data.datasets import synthetic_dataset
    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.models.resnet import ResNet, BasicBlock, init_classifier
    from uurg_tpu.unlearn.protocol import pretrain
    from uurg_tpu.workloads.classification import Classifier

    model = ResNet([3, 4, 6, 3], BasicBlock, 4, imagenet_stem=True,
                   dtype=jnp.bfloat16)
    train = synthetic_dataset(1200, 32, 3, 4, seed=0, base_seed=0)
    params, bs = init_classifier(jax.random.key(0), model, resolution=32)
    params, bs = pretrain(Classifier(model), params, bs, train, epochs=4,
                          lr=0.01, batch_size=128, seed=0)
    ck = tmp_path / "probe"
    save_checkpoint(str(ck), {"params": params, "batch_stats": bs})

    samples = tmp_path / "samples"
    samples.mkdir()
    c0 = (train.images[train.labels == 0][:16] * 255).astype(np.uint8)
    for i, img in enumerate(c0):
        Image.fromarray(img).save(samples / f"0_{i:04d}.png")

    csv_path = tmp_path / "probe.csv"
    out = subprocess.run(
        [sys.executable, os.path.join(CLI_DIR, "classifier_evaluation.py"),
         str(samples), "--classifier_ckpt", str(ck),
         "--label_of_forgotten_class", "0", "--num_classes", "4",
         "--image_size", "32", "--csv", str(csv_path)],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    row = csv_path.read_text().strip().splitlines()[-1].split(",")
    header = csv_path.read_text().splitlines()[0].split(",")
    prob = float(row[header.index("avg_prob_forgotten")])
    # on-class training images through a probe evaluated at its training
    # resolution: well above chance (0.25). The 224px-mismatch bug gave ~0.
    assert prob > 0.4, (prob, out.stdout)
