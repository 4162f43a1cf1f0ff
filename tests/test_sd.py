"""SD stack tests: UNet, VAE, CLIP text, workload losses (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.models.autoencoder_kl import AutoencoderKL, VAEConfig, init_vae

pytestmark = pytest.mark.slow  # big-model fixtures
from uurg_tpu.models.clip_text import (
    CLIPTextConfig,
    hash_tokenize,
    init_clip_text,
)
from uurg_tpu.models.sd_unet import (
    SDUNet,
    SDUNetConfig,
    init_sd_unet,
    train_method_mask,
)

TINY_UNET = SDUNetConfig(model_channels=16, channel_mult=(1, 2),
                         num_res_blocks=1, attention_ds=(1, 2), num_heads=2,
                         context_dim=16, dtype=jnp.float32)
TINY_VAE = VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     dtype=jnp.float32)
TINY_TEXT = CLIPTextConfig(vocab_size=49408, max_length=8, hidden_size=16,
                           depth=2, num_heads=2)


@pytest.fixture(scope="module")
def tiny_sd_unet():
    return init_sd_unet(jax.random.key(0), TINY_UNET, latent_size=8,
                        context_len=8)


def test_sd_unet_forward(tiny_sd_unet):
    model, params = tiny_sd_unet
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 16))
    out = model.apply({"params": params}, x, jnp.asarray([0, 10]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sd_unet_context_matters(tiny_sd_unet):
    model, params = tiny_sd_unet
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    t = jnp.asarray([5])
    a = model.apply({"params": params}, x, t,
                    jnp.zeros((1, 8, 16)))
    b = model.apply({"params": params}, x, t,
                    jnp.ones((1, 8, 16)))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_train_method_masks(tiny_sd_unet):
    _, params = tiny_sd_unet
    full = train_method_mask(params, "full")
    xattn = train_method_mask(params, "xattn")
    notime = train_method_mask(params, "notime")

    def frac_on(mask):
        leaves = jax.tree_util.tree_leaves(mask)
        tot = sum(l.size for l in leaves)
        on = sum(float(jnp.sum(l)) for l in leaves)
        return on / tot

    assert frac_on(full) == 1.0
    assert 0 < frac_on(xattn) < 1.0
    assert 0 < frac_on(notime) < 1.0
    # xattn mask selects only attn2 paths
    flat = jax.tree_util.tree_leaves_with_path(xattn)
    for path, leaf in flat:
        p = "/".join(str(k.key) for k in path)
        if float(jnp.max(leaf)) > 0:
            assert "attn2" in p


def test_vae_roundtrip_shapes():
    model, params = init_vae(jax.random.key(0), TINY_VAE, resolution=16)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    z = model.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 8, 8, 4)  # one downsample pair (1,2) -> /2
    rec = model.apply({"params": params}, z, method=AutoencoderKL.decode)
    assert rec.shape == (2, 16, 16, 3)


def test_vae_encode_stochastic_vs_mean():
    model, params = init_vae(jax.random.key(0), TINY_VAE, resolution=16)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
    z_mean = model.apply({"params": params}, x, method=AutoencoderKL.encode)
    z_a = model.apply({"params": params}, x, jax.random.key(2),
                      method=AutoencoderKL.encode)
    z_b = model.apply({"params": params}, x, jax.random.key(3),
                      method=AutoencoderKL.encode)
    assert not np.allclose(np.asarray(z_a), np.asarray(z_b))
    assert not np.allclose(np.asarray(z_mean), np.asarray(z_a))


def test_clip_text_encoder_shapes():
    model, params = init_clip_text(jax.random.key(0), TINY_TEXT)
    ids = jnp.asarray(hash_tokenize(["a photo of a cat", "dog"], 8))
    out = model.apply({"params": params}, ids)
    assert out.shape == (2, 8, 16)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_hash_tokenize_deterministic():
    a = hash_tokenize(["hello world"], 8)
    b = hash_tokenize(["hello world"], 8)
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == 49406  # BOS


def test_sd_workload_losses():
    from uurg_tpu.workloads.sd import SDWorkload

    wl = SDWorkload.build(TINY_UNET, TINY_VAE, TINY_TEXT)
    _, unet_params = init_sd_unet(jax.random.key(0), TINY_UNET, 8, 8)
    z = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 16))
    ctx2 = jax.random.normal(jax.random.key(3), (2, 8, 16))

    loss = wl.shared_step_loss(unet_params, (z, ctx), jax.random.key(4))
    assert np.isfinite(float(loss)) and float(loss) > 0

    floss = wl.nsfw_forget_loss_fn()(unet_params, (z, ctx, ctx2),
                                     jax.random.key(5))
    assert np.isfinite(float(floss))

    t = jnp.asarray([3, 7])
    z_t = wl.schedule.q_sample(z, t, jax.random.normal(jax.random.key(6),
                                                       z.shape))
    eloss = wl.esd_loss_fn(1.0)(
        unet_params, (z_t, t, ctx, ctx2), jax.random.key(7), unet_params)
    assert np.isfinite(float(eloss))

    galoss = wl.ga_loss_fn(1.0)(unet_params, ((z, ctx), (z, ctx2)),
                                jax.random.key(8))
    assert np.isfinite(float(galoss))

    fisher = wl.fisher_loss_fn(3.0)(unet_params, (z, ctx, ctx2),
                                    jax.random.key(9))
    assert float(fisher) < 0  # negated MSE


def test_prox_operator_shrinks_toward_init():
    from uurg_tpu.workloads.sd import SDWorkload

    wl = SDWorkload.build(TINY_UNET, TINY_VAE, TINY_TEXT)
    init = {"w": jnp.zeros(8)}
    prox = wl.make_prox_operator(init, top_ratio=0.25)
    params = {"w": jnp.asarray([4.0, -3.0, 0.5, 0.1, 0, 0, 0, 0])}
    out = prox(params)
    w = np.asarray(out["w"])
    # top-25% threshold = 2nd largest |delta| = 3.0: shrink all by 3
    np.testing.assert_allclose(w[:2], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(w[2:], 0.0, atol=1e-6)


def test_sd_remat_policy_grad_parity():
    """remat_policy (None / dots) changes only backward memory, not grads."""
    import dataclasses

    from uurg_tpu.models.sd_unet import init_sd_unet

    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    t = jnp.full((2,), 3, jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (2, 8, 16))
    sums = []
    for pol in (None, "dots"):
        cfg = dataclasses.replace(TINY_UNET, remat_policy=pol)
        model, params = init_sd_unet(jax.random.key(0), cfg, latent_size=8,
                                     context_len=8)
        g = jax.grad(lambda p: model.apply(
            {"params": p}, x, t, ctx).astype(jnp.float32).sum())(params)
        sums.append(float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.abs(b).sum(), g, 0.0)))
    assert sums[0] == sums[1], sums
