"""torchvision ViT/Swin -> Flax converter parity vs torch replicas.

The replicas mirror torchvision's VisionTransformer and SwinTransformer
module layouts (state-dict key names AND forward semantics: MultiheadAttention
fused qkv, shifted-window attention with relative position bias and roll
masks, sub-grid patch merging) — the formats the reference builds on
(Classification/models/vit.py:4-8, Classification/models/swin.py:4-19).
Full forwards must agree to float tolerance, which pins every layout rule in
io/tv_vit_swin_interop.py (qkv stacking, the merge-axis block permutation,
exact-erf GELU).
"""
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from uurg_tpu.io.tv_vit_swin_interop import (  # noqa: E402
    torch_swin_to_flax, torch_vit_to_flax)
from uurg_tpu.models.swin import Swin, SwinConfig  # noqa: E402
from uurg_tpu.models.vit import ViT, ViTConfig  # noqa: E402

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------- ViT replica
class TorchEncoderBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(dim)
        self.self_attention = tnn.MultiheadAttention(dim, heads,
                                                     batch_first=True)
        self.ln_2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential(tnn.Linear(dim, mlp_dim), tnn.GELU(),
                                  tnn.Dropout(0.0), tnn.Linear(mlp_dim, dim),
                                  tnn.Dropout(0.0))

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class TorchEncoder(tnn.Module):
    def __init__(self, seq, dim, depth, heads, mlp_dim):
        super().__init__()
        self.pos_embedding = tnn.Parameter(torch.randn(1, seq, dim) * 0.02)
        self.layers = tnn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", TorchEncoderBlock(dim, heads, mlp_dim))
            for i in range(depth)))
        self.ln = tnn.LayerNorm(dim)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class TorchViT(tnn.Module):
    """torchvision VisionTransformer-shaped (keys + forward)."""

    def __init__(self, image_size, patch, dim, depth, heads, mlp_dim, ncls):
        super().__init__()
        self.patch = patch
        self.conv_proj = tnn.Conv2d(3, dim, patch, patch)
        self.class_token = tnn.Parameter(torch.zeros(1, 1, dim))
        seq = (image_size // patch) ** 2 + 1
        self.encoder = TorchEncoder(seq, dim, depth, heads, mlp_dim)
        self.heads = tnn.Sequential(OrderedDict(head=tnn.Linear(dim, ncls)))

    def forward(self, x):
        B = x.shape[0]
        h = self.conv_proj(x)
        h = h.reshape(B, h.shape[1], -1).permute(0, 2, 1)
        h = torch.cat([self.class_token.expand(B, -1, -1), h], dim=1)
        h = self.encoder(h)
        return self.heads(h[:, 0])


def test_vit_converter_full_forward():
    torch.manual_seed(0)
    tm = TorchViT(image_size=16, patch=4, dim=32, depth=2, heads=4,
                  mlp_dim=128, ncls=5).eval()
    # re-randomize the zero-init class token so the test is non-trivial
    with torch.no_grad():
        tm.class_token.normal_(0, 0.5)
    params, dropped = torch_vit_to_flax(tm.state_dict())
    assert dropped == []

    x = np.random.RandomState(1).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    fm = ViT(ViTConfig(image_size=16, patch_size=4, hidden_size=32, depth=2,
                       num_heads=4, num_classes=5))
    out = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_vit_dangling_reference_head_dropped():
    torch.manual_seed(0)
    tm = TorchViT(16, 4, 32, 1, 4, 64, ncls=7)
    sd = dict(tm.state_dict())
    # the reference's `model.head = nn.Linear(...)` adds dangling keys
    sd["head.weight"] = torch.zeros(3, 32)
    sd["head.bias"] = torch.zeros(3)
    params, dropped = torch_vit_to_flax(sd)
    assert sorted(dropped) == ["head.bias", "head.weight"]
    assert params["head"]["kernel"].shape == (32, 7)  # live 7-way heads.head


# --------------------------------------------------------------- Swin replica
def _rel_pos_index(w):
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).long()


class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.heads, self.window = heads, window
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.register_buffer("relative_position_index", _rel_pos_index(window))


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        hid = int(dim * mlp_ratio)
        self.mlp = tnn.Sequential(tnn.Linear(dim, hid), tnn.GELU(),
                                  tnn.Dropout(0.0), tnn.Linear(hid, dim),
                                  tnn.Dropout(0.0))

    def forward(self, x):  # x: (B, H, W, C), torchvision channel order
        B, H, W, C = x.shape
        w = min(self.window, H)
        shift = self.shift if w < H else 0
        a = self.attn
        h = self.norm1(x)
        if shift:
            h = torch.roll(h, (-shift, -shift), dims=(1, 2))
        nH, nW = H // w, W // w
        hw = h.view(B, nH, w, nW, w, C).permute(0, 1, 3, 2, 4, 5)
        hw = hw.reshape(B * nH * nW, w * w, C)
        qkv = a.qkv(hw).reshape(hw.shape[0], w * w, 3, a.heads, C // a.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * (C // a.heads) ** -0.5
        bias = a.relative_position_bias_table[
            a.relative_position_index.view(-1)].view(w * w, w * w, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if shift:
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                for ws in (slice(0, -w), slice(-w, -shift),
                           slice(-shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            win = img.view(1, nH, w, nW, w, 1).permute(0, 1, 3, 2, 4, 5)
            win = win.reshape(nH * nW, w * w)
            mask = win.unsqueeze(1) - win.unsqueeze(2)
            mask = torch.where(mask != 0, torch.tensor(-100.0),
                               torch.tensor(0.0))
            attn = attn.view(B, nH * nW, a.heads, w * w, w * w)
            attn = attn + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.reshape(B * nH * nW, a.heads, w * w, w * w)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(hw.shape[0], w * w, C)
        out = a.proj(out)
        out = out.view(B, nH, nW, w, w, C).permute(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        if shift:
            out = torch.roll(out, (shift, shift), dims=(1, 2))
        x = x + out
        return x + self.mlp(self.norm2(x))


class TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        return self.reduction(self.norm(torch.cat([x0, x1, x2, x3], -1)))


class TorchSwin(tnn.Module):
    """torchvision SwinTransformer-shaped (features indexing + keys)."""

    def __init__(self, patch, embed, depths, heads, window, ncls):
        super().__init__()
        feats: list[tnn.Module] = [tnn.Sequential(
            tnn.Conv2d(3, embed, patch, patch), tnn.Identity(),
            tnn.LayerNorm(embed))]
        dim = embed
        for i, (d, h) in enumerate(zip(depths, heads)):
            feats.append(tnn.Sequential(*[
                TorchSwinBlock(dim, h, window,
                               0 if j % 2 == 0 else window // 2)
                for j in range(d)]))
            if i < len(depths) - 1:
                feats.append(TorchPatchMerging(dim))
                dim *= 2
        self.features = tnn.Sequential(*feats)
        self.norm = tnn.LayerNorm(dim)
        self.head = tnn.Linear(dim, ncls)

    def forward(self, x):
        h = self.features[0][0](x).permute(0, 2, 3, 1)
        h = self.features[0][2](h)
        for f in self.features[1:]:
            h = f(h)
        h = self.norm(h)
        return self.head(h.mean(dim=(1, 2)))


def test_swin_converter_full_forward():
    torch.manual_seed(0)
    tm = TorchSwin(patch=4, embed=16, depths=(2, 2), heads=(2, 4), window=2,
                   ncls=5).eval()
    params, dropped = torch_swin_to_flax(tm.state_dict())
    assert all("relative_position_index" in k for k in dropped)

    x = np.random.RandomState(2).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    fm = Swin(SwinConfig(patch_size=4, embed_dim=16, depths=(2, 2),
                         num_heads=(2, 4), window=2, num_classes=5))
    out = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_swin_merge_permutation_is_loadbearing():
    """Scrambling the merge-axis permutation must break parity (guards the
    [0,2,1,3] block map against silent identity)."""
    torch.manual_seed(3)
    tm = TorchSwin(4, 16, (1, 1), (2, 4), 2, 5).eval()
    params, _ = torch_swin_to_flax(tm.state_dict())
    x = np.random.RandomState(4).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    fm = Swin(SwinConfig(patch_size=4, embed_dim=16, depths=(1, 1),
                         num_heads=(2, 4), window=2, num_classes=5))
    good = fm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(good), ref, atol=3e-5, rtol=1e-4)

    bad = jax.tree_util.tree_map(lambda v: v, params)
    kern = np.asarray(bad["merge0"]["reduction"]["kernel"])
    blocks = np.split(kern, 4, axis=0)  # undo block permutation -> torch order
    bad["merge0"]["reduction"]["kernel"] = jnp.asarray(
        np.concatenate([blocks[0], blocks[2], blocks[1], blocks[3]], axis=0))
    out = fm.apply({"params": bad}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert not np.allclose(np.asarray(out), ref, atol=1e-3)


# ------------------------------------------------------- overlay + dispatch
def test_overlay_pretrained_reinitializes_mismatched_head():
    from uurg_tpu.io.torch_classifier import overlay_pretrained

    init = {"head": {"kernel": jnp.zeros((32, 10)), "bias": jnp.zeros((10,))},
            "block": {"kernel": jnp.zeros((32, 32))}}
    loaded = {"head": {"kernel": np.ones((32, 1000)),
                       "bias": np.ones((1000,))},
              "block": {"kernel": np.ones((32, 32))}}
    out = overlay_pretrained(init, loaded)
    assert float(out["block"]["kernel"].sum()) == 32 * 32  # backbone loaded
    assert float(out["head"]["kernel"].sum()) == 0.0  # 1000-way head dropped
    assert out["head"]["kernel"].shape == (32, 10)
