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

pytestmark = pytest.mark.slow  # SD workload fixtures compile for minutes

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


def test_esd_batch_builder_uses_current_params(wl, unet_params):
    """ESD batches must come from the partial-denoise sampler path
    (train-esd.py:266-301): the latent depends on the CURRENT params and
    the DDPM timestep lands in t_enc's bucket."""
    ctx_c = jax.random.normal(jax.random.key(1), (1, 8, 16))
    ctx_0 = jnp.zeros((1, 8, 16))
    build = sd_runner.esd_batch_builder(
        wl, ctx_c, ctx_0, ddim_steps=5, start_guidance=2.0, latent_size=8,
        batch_size=2)
    key = jax.random.key(7)
    z1, t1, c, c0 = build(unet_params, key)
    assert z1.shape == (2, 8, 8, 4) and t1.shape == (2,)
    assert np.all(np.isfinite(np.asarray(z1)))
    # same key, perturbed params -> different latents (params-dependent path)
    bumped = jax.tree_util.tree_map(lambda p: p + 0.05, unet_params)
    z2, t2, _, _ = build(bumped, key)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    # t_ddpm inside the t_enc bucket: all samples share one bucket of width
    # T/ddim_steps = 200
    t = np.asarray(t1)
    assert np.all(t >= 0) and np.all(t < 1000)
    assert (t // 200 == t[0] // 200).all()


def test_train_esd_with_builder_loss_decreases(wl, unet_params):
    """train_esd on a batch produced by the sampler-path builder: the ESD
    loss on that batch must descend (done-criterion from the round-1
    review). A single fixed batch keeps the check deterministic — a tiny
    random model cannot be expected to generalize across random t_enc."""
    ctx_c = jax.random.normal(jax.random.key(1), (1, 8, 16))
    ctx_0 = jnp.zeros((1, 8, 16))
    build = sd_runner.esd_batch_builder(
        wl, ctx_c, ctx_0, ddim_steps=4, start_guidance=2.0, latent_size=8,
        batch_size=2)
    fixed = build(unet_params, jax.random.key(99))
    frozen = jax.tree_util.tree_map(jnp.asarray, unet_params)
    losses = []
    sd_runner._single_loss_loop(
        wl, unet_params, wl.esd_loss_fn(1.0), itertools.repeat(fixed),
        n_iters=10, lr=1e-3, train_method="full", seed=0, aux=frozen,
        loss_sink=lambda i, l: losses.append(float(l)))
    assert len(losses) == 10 and all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sampler_does_not_capture_text_encoder(wl, unet_params):
    """make_sampler must evaluate the empty-prompt context EAGERLY: closing
    the frozen CLIP apply into the jitted sampler bakes its params into the
    HLO as constants (real-TPU failure: compile-relay HTTP 413)."""
    sampler = wl.make_sampler(num_steps=2, guidance_scale=2.0, latent_size=8)
    saved = wl.text_params
    try:
        wl.text_params = None  # sampling must no longer touch the encoder
        ctx = jax.random.normal(jax.random.key(0), (1, 8, 16))
        z = sampler(unet_params, ctx, jax.random.key(1))
        assert np.all(np.isfinite(np.asarray(z)))
    finally:
        wl.text_params = saved


def test_nsfw_removal_loop_under_tp_mesh(wl, unet_params):
    """nsfw_removal with mesh= + parallelism='tp' (the --mesh CLI path):
    SD_TP_RULES + fsdp fallback over a (data=2, model=4) virtual mesh."""
    from uurg_tpu.parallel import make_mesh

    mesh = make_mesh({"data": 2, "model": 4})
    out = sd_runner.nsfw_removal(
        wl, unet_params,
        _z_ctx_batches(jax.random.key(0), with_pseudo=True),
        _z_ctx_batches(jax.random.key(1)),
        n_iters=2, lr=1e-4, train_method="xattn", snapshot_freq=10,
        mesh=mesh, parallelism="tp")
    assert _finite(out)


def test_nsfw_removal_loop_under_sp_mesh(wl, unet_params):
    """nsfw_removal under parallelism='sp': UNet self-attention (T=64/16)
    and cross-attention (T_kv=8) both ring over the 'seq' axis; params
    after 2 steps match the meshless run."""
    from uurg_tpu.parallel import make_mesh

    kw = dict(n_iters=2, lr=1e-4, train_method="xattn", snapshot_freq=10)
    ref = sd_runner.nsfw_removal(
        wl, unet_params,
        _z_ctx_batches(jax.random.key(0), with_pseudo=True),
        _z_ctx_batches(jax.random.key(1)), **kw)
    out = sd_runner.nsfw_removal(
        wl, unet_params,
        _z_ctx_batches(jax.random.key(0), with_pseudo=True),
        _z_ctx_batches(jax.random.key(1)),
        mesh=make_mesh({"data": 2, "seq": 4}), parallelism="sp", **kw)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_nsfw_removal_memory_policy_knobs(wl, unet_params):
    """bf16 nu + bit-packed saliency mask run through the SD erasure loop."""
    mask = jax.tree_util.tree_map(
        lambda p: jnp.ones(p.shape, bool), unet_params)
    out = sd_runner.nsfw_removal(
        wl, unet_params,
        _z_ctx_batches(jax.random.key(0), with_pseudo=True),
        _z_ctx_batches(jax.random.key(1)),
        n_iters=2, lr=1e-4, train_method="xattn", saliency_mask=mask,
        nu_dtype=jnp.bfloat16, pack_mask=True, snapshot_freq=10)
    assert _finite(out)
