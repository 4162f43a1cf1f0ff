"""torch ResNet -> Flax converter parity vs hand-built torch replicas.

Replicas mirror torchvision's ResNet (imagenet stem, ``downsample``/``fc``
naming — the UA probe format, DDPM/classifier_evaluation.py:16-40) and the
reference's CIFAR-style ResNet (3x3 stem, ``shortcut``/``linear`` naming —
Classification/models/resnet.py). Outputs must match to float tolerance,
which also pins the torch-style explicit conv padding in models/resnet.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from uurg_tpu.io.tv_resnet_interop import torch_resnet_to_flax  # noqa: E402
from uurg_tpu.models.resnet import BasicBlock, ResNet  # noqa: E402

pytestmark = pytest.mark.slow


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride, naming="downsample"):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        sc = None
        if stride != 1 or cin != cout:
            sc = tnn.Sequential(tnn.Conv2d(cin, cout, 1, stride, bias=False),
                                tnn.BatchNorm2d(cout))
        if naming == "downsample":
            self.downsample = sc
        else:
            self.shortcut = sc if sc is not None else tnn.Sequential()

    def forward(self, x):
        sc = getattr(self, "downsample", None)
        if sc is None:
            sc = getattr(self, "shortcut", None)
        idn = x if sc is None or len(list(sc.children())) == 0 else sc(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idn)


class TorchResNet(tnn.Module):
    """torchvision-shaped (imagenet=True) or reference-CIFAR-shaped."""

    def __init__(self, stage_sizes, width=8, num_classes=4, imagenet=True):
        super().__init__()
        naming = "downsample" if imagenet else "shortcut"
        if imagenet:
            self.conv1 = tnn.Conv2d(3, width, 7, 2, 3, bias=False)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
        else:
            self.conv1 = tnn.Conv2d(3, width, 3, 1, 1, bias=False)
            self.maxpool = None
        self.bn1 = tnn.BatchNorm2d(width)
        cin = width
        for i, n in enumerate(stage_sizes):
            blocks = []
            for j in range(n):
                stride = 2 if i > 0 and j == 0 else 1
                blocks.append(TorchBasicBlock(cin, width * 2**i, stride,
                                              naming))
                cin = width * 2**i
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        head = tnn.Linear(cin, num_classes)
        if imagenet:
            self.fc = head
        else:
            self.linear = head
        self.n_stages = len(stage_sizes)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        if self.maxpool is not None:
            h = self.maxpool(h)
        for i in range(self.n_stages):
            h = getattr(self, f"layer{i + 1}")(h)
        h = h.mean(dim=(2, 3))
        head = getattr(self, "fc", None) or getattr(self, "linear")
        return head(h)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def _compare(tmodel, fmodel, res):
    tmodel.eval()
    params, stats = torch_resnet_to_flax(tmodel.state_dict())
    x = np.random.default_rng(0).normal(
        0, 1, (2, res, res, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    f_out = fmodel.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(f_out), t_out, rtol=1e-4,
                               atol=1e-4)


def test_torchvision_imagenet_stem_parity():
    tm = TorchResNet([1, 1, 1, 1], imagenet=True)
    _randomize(tm, 1)
    fm = ResNet([1, 1, 1, 1], BasicBlock, num_classes=4, width=8,
                imagenet_stem=True)
    _compare(tm, fm, 64)


def test_torchvision_resnet34_shape_parity():
    tm = TorchResNet([3, 4, 6, 3], imagenet=True)
    _randomize(tm, 2)
    fm = ResNet([3, 4, 6, 3], BasicBlock, num_classes=4, width=8,
                imagenet_stem=True)
    _compare(tm, fm, 64)


def test_reference_cifar_naming_parity():
    tm = TorchResNet([2, 2, 2, 2], imagenet=False)
    _randomize(tm, 3)
    fm = ResNet([2, 2, 2, 2], BasicBlock, num_classes=4, width=8)
    _compare(tm, fm, 32)


def test_dataparallel_prefix_and_containers():
    tm = TorchResNet([1, 1], imagenet=False)
    _randomize(tm, 4)
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    params, stats = torch_resnet_to_flax(sd)
    assert "conv_stem" in params and "bn_stem" in stats


def test_strict_rejects_unknown_keys():
    with pytest.raises(ValueError):
        torch_resnet_to_flax({"bogus.weight": np.zeros((1,))})
