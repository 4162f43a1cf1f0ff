"""Conditional UNet tests (tiny config — 1 CPU core in CI)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.models.unet_cond import CondUNet, UNetConfig, init_unet

TINY = UNetConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
    dropout=0.0, resolution=8, n_classes=10, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_unet():
    # jitted init is the cheaper option even on CPU: measured 27s vs 47s
    # for the eager per-op dispatch of the same init on this box
    model, params = init_unet(jax.random.key(0), TINY)
    return model, params


def test_forward_shape(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    t = jnp.asarray([0, 5])
    c = jnp.asarray([1, 2])
    out = model.apply({"params": params}, x, t, c)
    assert out.shape == (2, 8, 8, 3)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_null_class_embedding_changes_output(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    t = jnp.asarray([3, 3])
    c = jnp.asarray([1, 1])
    cond = model.apply({"params": params}, x, t, c,
                       jnp.asarray([True, True]))
    uncond = model.apply({"params": params}, x, t, c,
                         jnp.asarray([False, False]))
    assert not np.allclose(np.asarray(cond), np.asarray(uncond))


def test_class_conditioning_matters(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 3))
    t = jnp.asarray([3])
    a = model.apply({"params": params}, x, t, jnp.asarray([0]))
    b = model.apply({"params": params}, x, t, jnp.asarray([7]))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_timestep_conditioning_matters(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 3))
    c = jnp.asarray([0])
    a = model.apply({"params": params}, x, jnp.asarray([0]), c)
    b = model.apply({"params": params}, x, jnp.asarray([9]), c)
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_full_cifar_config_param_count():
    # reference Conditional_Model at ch=128, mult (1,2,2,2) is ~35.7M params
    # (SURVEY.md section 0). Init only — no forward.
    cfg = UNetConfig()  # defaults == DDPM/configs/cifar10_sfron.yml
    _, params = init_unet(jax.random.key(0), cfg)
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert 30e6 < n < 40e6, f"param count {n/1e6:.1f}M out of expected band"


def test_timestep_embedding_matches_reference_formula():
    from uurg_tpu.models.layers import timestep_embedding
    import math

    t = jnp.asarray([0.0, 1.0, 37.0])
    dim = 16
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(math.log(10000) / (half - 1)))
    args = np.asarray(t)[:, None] * freqs[None, :]
    expect = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    # float32 model math vs float64 numpy reference
    np.testing.assert_allclose(emb, expect, rtol=1e-4, atol=1e-5)
