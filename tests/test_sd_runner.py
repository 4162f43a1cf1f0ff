"""SD erasure runner loops on tiny configs (few iterations, CPU)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.models.autoencoder_kl import VAEConfig, init_vae
from uurg_tpu.models.clip_text import CLIPTextConfig, init_clip_text
from uurg_tpu.models.sd_unet import SDUNetConfig, init_sd_unet
from uurg_tpu.workloads import sd_runner
from uurg_tpu.workloads.sd import SDWorkload

TINY_UNET = SDUNetConfig(model_channels=16, channel_mult=(1, 2),
                         num_res_blocks=1, attention_ds=(1, 2), num_heads=2,
                         context_dim=16, dtype=jnp.float32)
TINY_VAE = VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     dtype=jnp.float32)
TINY_TEXT = CLIPTextConfig(max_length=8, hidden_size=16, depth=1, num_heads=2)


@pytest.fixture(scope="module")
def wl():
    w = SDWorkload.build(TINY_UNET, TINY_VAE, TINY_TEXT)
    _, w.vae_params = init_vae(jax.random.key(1), TINY_VAE, resolution=16)
    _, w.text_params = init_clip_text(jax.random.key(2), TINY_TEXT)
    return w


@pytest.fixture(scope="module")
def unet_params():
    _, p = init_sd_unet(jax.random.key(0), TINY_UNET, latent_size=8,
                        context_len=8)
    return p


def _z_ctx_batches(key, with_pseudo=False):
    k1, k2, k3 = jax.random.split(key, 3)
    z = jax.random.normal(k1, (2, 8, 8, 4))
    ctx = jax.random.normal(k2, (2, 8, 16))
    ctx2 = jax.random.normal(k3, (2, 8, 16))
    if with_pseudo:
        return itertools.repeat((z, ctx, ctx2))
    return itertools.repeat((z, ctx))


def _finite(params):
    return all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(params))


def test_nsfw_removal_loop(wl, unet_params):
    out = sd_runner.nsfw_removal(
        wl, unet_params,
        _z_ctx_batches(jax.random.key(0), with_pseudo=True),
        _z_ctx_batches(jax.random.key(1)),
        n_iters=2, lr=1e-4, train_method="xattn", snapshot_freq=10)
    assert _finite(out)


def test_train_esd_loop(wl, unet_params):
    t = jnp.asarray([3, 7])
    k = jax.random.key(0)
    z_t = jax.random.normal(k, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (2, 8, 16))
    ctx0 = jnp.zeros((2, 8, 16))
    out = sd_runner.train_esd(
        wl, unet_params, itertools.repeat((z_t, t, ctx, ctx0)),
        n_iters=2, lr=1e-4, train_method="xattn")
    assert _finite(out)
    # xattn method: non-attn2 params unchanged
    flat_in = jax.tree_util.tree_leaves_with_path(unet_params)
    for path, leaf in flat_in:
        p = "/".join(str(x.key) for x in path)
        node = out
        for x in path:
            node = node[x.key]
        if "attn2" not in p:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(node),
                                          err_msg=p)


def test_certain_label_loop(wl, unet_params):
    out = sd_runner.certain_label(
        wl, unet_params,
        _z_ctx_batches(jax.random.key(0), with_pseudo=True),
        _z_ctx_batches(jax.random.key(1)),
        n_iters=2, lr=1e-4)
    assert _finite(out)


def test_gradient_ascent_loop(wl, unet_params):
    out = sd_runner.gradient_ascent(
        wl, unet_params, _z_ctx_batches(jax.random.key(0)),
        _z_ctx_batches(jax.random.key(1)), n_iters=2, lr=1e-4)
    assert _finite(out)


def test_proximal_gradient_loop(wl, unet_params):
    out = sd_runner.proximal_gradient(
        wl, unet_params, _z_ctx_batches(jax.random.key(0)),
        _z_ctx_batches(jax.random.key(1)), n_iters=2, lr=1e-3,
        top_ratio=0.5)
    assert _finite(out)


def test_sd_sampler(wl, unet_params):
    sampler = wl.make_sampler(num_steps=3, guidance_scale=2.0, latent_size=8)
    ctx = jax.random.normal(jax.random.key(0), (2, 8, 16))
    z = sampler(unet_params, ctx, jax.random.key(1))
    assert z.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(z)))
