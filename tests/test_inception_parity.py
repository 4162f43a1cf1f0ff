"""Numerical parity of the Flax FID-Inception + weight converter against a
self-contained torch replica of pytorch-fid's model (the standard port of
the reference's TF1 evaluator graph, DDPM/evaluator.py:32-36).

Strategy for a zero-egress machine: no pretrained checkpoint (and no
torchvision) exists locally, so the torch reference architecture is built
here from scratch with the pt_inception module/key layout, RANDOM weights
and perturbed BN stats; the state_dict goes through the real converter and
the Flax model must reproduce pool3/spatial/logits. If the mapping and op
semantics are exact on random weights, they are exact on the real
checkpoint.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from uurg_tpu.eval.inception import InceptionV3  # noqa: E402
from uurg_tpu.io.inception_interop import (  # noqa: E402
    convert_inception_state_dict,
    unflatten_variables,
)


class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


def _avgp(x):  # TF-style: padding excluded from the divisor
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class InceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        d = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([
            self.branch1x1(x), self.branch5x5_2(self.branch5x5_1(x)), d,
            self.branch_pool(_avgp(x))], 1)


class InceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        d = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), d,
                          F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        d = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            d = m(d)
        return torch.cat([self.branch1x1(x), b7, d,
                          self.branch_pool(_avgp(x))], 1)


class InceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3,
                  self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(tnn.Module):
    def __init__(self, cin, pool: str):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        d = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        d = torch.cat([self.branch3x3dbl_3a(d), self.branch3x3dbl_3b(d)], 1)
        if self.pool == "max":  # Mixed_7c: TF graph quirk (pytorch-fid E_2)
            p = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            p = _avgp(x)
        return torch.cat([self.branch1x1(x), b3, d, self.branch_pool(p)], 1)


class TorchFIDInception(tnn.Module):
    """pt_inception-2015-12-05 layout (1008-way, FID pool patches)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, "avg")
        self.Mixed_7c = InceptionE(2048, "max")
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d):
            x = m(x)
        x = self.Mixed_6e(x)
        spatial = x[:, :7]
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        pool = x.mean(dim=(2, 3))
        return pool, spatial, self.fc(pool)


def _build_torch_fid_model(seed=0):
    torch.manual_seed(seed)
    m = TorchFIDInception()
    g = torch.Generator().manual_seed(seed)
    # well-scaled random weights + non-trivial BN stats so every tensor
    # kind in the converter is exercised
    for mod in m.modules():
        if isinstance(mod, tnn.Conv2d):
            fan_in = mod.weight[0].numel()
            mod.weight.data.normal_(0.0, fan_in ** -0.5, generator=g)
        elif isinstance(mod, tnn.BatchNorm2d):
            mod.weight.data.uniform_(0.8, 1.2, generator=g)
            mod.bias.data.normal_(0.0, 0.05, generator=g)
            mod.running_mean.normal_(0.0, 0.05, generator=g)
            mod.running_var.uniform_(0.7, 1.3, generator=g)
        elif isinstance(mod, tnn.Linear):
            mod.weight.data.normal_(0.0, 0.02, generator=g)
            mod.bias.data.zero_()
    m.eval()
    return m


@pytest.mark.slow
def test_converted_weights_match_torch_outputs():
    import jax.numpy as jnp

    tm = _build_torch_fid_model()
    variables = unflatten_variables(
        convert_inception_state_dict(tm.state_dict()))

    x = np.random.default_rng(0).normal(0, 0.5, (2, 299, 299, 3))
    x = np.clip(x, -1, 1).astype(np.float32)
    with torch.no_grad():
        t_pool, t_spatial, t_logits = tm(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    fm = InceptionV3()
    pool, spatial, logits = fm.apply(variables, jnp.asarray(x))

    t_spatial = t_spatial.numpy().transpose(0, 2, 3, 1).reshape(2, -1)

    def close(a, b, name):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 2e-3, f"{name}: rel err {err}"

    close(pool, t_pool.numpy(), "pool3")
    close(logits, t_logits.numpy(), "logits")
    close(spatial, t_spatial, "spatial")


@pytest.mark.slow
def test_npz_roundtrip_matches_direct_load(tmp_path):
    import jax.numpy as jnp

    from uurg_tpu.eval.inception import load_inception_npz

    tm = _build_torch_fid_model(seed=3)
    flat = convert_inception_state_dict(tm.state_dict())
    np.savez(tmp_path / "w.npz", **flat)
    via_npz = load_inception_npz(str(tmp_path / "w.npz"))
    direct = unflatten_variables(flat)
    x = jnp.zeros((1, 299, 299, 3))
    fm = InceptionV3()
    a = fm.apply(via_npz, x)
    b = fm.apply(direct, x)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))
