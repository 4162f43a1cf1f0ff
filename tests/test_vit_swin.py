"""ViT and Swin classifier forward tests (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.models.swin import Swin, SwinConfig
from uurg_tpu.models.vit import ViT, ViTConfig


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_vit_tiny_forward():
    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=32, depth=2,
                    num_heads=2, num_classes=5)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    params = jax.jit(model.init)({"params": jax.random.key(0)}, x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_swin_tiny_forward():
    cfg = SwinConfig(patch_size=2, embed_dim=16, depths=(1, 1),
                     num_heads=(2, 2), window=4, num_classes=5)
    model = Swin(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    params = jax.jit(lambda k, xx: model.init(k, xx))(
        {"params": jax.random.key(0)}, x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_swin_shifted_window_mask():
    from uurg_tpu.models.swin import shift_attn_mask, window_partition, \
        window_unpartition

    mask = shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # roundtrip partition
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
    w = window_partition(x, 4)
    assert w.shape == (4, 16, 3)
    back = window_unpartition(w, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_registry_configs():
    from uurg_tpu.models.swin import Swin_B, Swin_S, Swin_T

    assert Swin_T().cfg.depths == (2, 2, 6, 2)
    assert Swin_S().cfg.depths == (2, 2, 18, 2)
    assert Swin_B().cfg.embed_dim == 128
