"""Host-side SD erasure runners (reference SD/train-scripts parity).

Each runner wires an SDWorkload's jitted losses into a training loop:
``nsfw_removal`` uses the shared SFR-on engine (two-phase masked update);
``train_esd``, ``certain_label``, ``gradient_ascent``, ``proximal_gradient``
are single-loss loops with method-specific batch construction.

Data enters as pre-encoded latents + contexts (the VAE/CLIP encodes are
jitted, frozen forwards) — see ``encode_image_folder``.
"""
from __future__ import annotations

import logging
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uurg_tpu.models.autoencoder_kl import AutoencoderKL
from uurg_tpu.models.sd_unet import train_method_leaf_mask
from uurg_tpu.train import make_optimizer
from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
from uurg_tpu.unlearn.sfron import init_state
from uurg_tpu.workloads.sd import SDWorkload

log = logging.getLogger("uurg.sd")


def _method_optimizer(unet_params, train_method: str, lr: float):
    """Adam over the train_method parameter subset only; frozen layers get
    optax.set_to_zero (no update, NO optimizer state — fits the 860M UNet on
    16GB), exactly the reference's param-group selection
    (SD/train-scripts/nsfw_removal.py:67-81)."""
    base = make_optimizer("adam", lr, mu_dtype=jnp.bfloat16)
    if train_method == "full":
        return base
    leaf_mask = train_method_leaf_mask(unet_params, train_method)
    labels = jax.tree_util.tree_map(
        lambda on: "train" if on else "freeze", leaf_mask)
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()}, labels)


def encode_image_folder(wl: SDWorkload, images: np.ndarray, prompts,
                        key, batch_size: int = 8):
    """Pre-encode images->latents and prompts->contexts with the frozen
    stages (one jitted call per batch)."""
    enc = jax.jit(lambda x, k: wl.vae.apply(
        {"params": wl.vae_params}, x, k, method=AutoencoderKL.encode))
    zs = []
    for i in range(0, len(images), batch_size):
        key, sub = jax.random.split(key)
        zs.append(np.asarray(enc(jnp.asarray(images[i:i + batch_size]), sub)))
    ctx = np.asarray(wl.get_learned_conditioning(prompts))
    return np.concatenate(zs), ctx


def nsfw_removal(
    wl: SDWorkload,
    unet_params,
    forget_batches: Iterator,   # yields (z_nude, ctx_nude, ctx_clothed)
    remain_batches: Iterator,   # yields (z_clothed, ctx_clothed)
    *,
    n_iters: int = 1000,
    lr: float = 1e-5,
    train_method: str = "full",
    saliency_mask=None,
    forget_alpha: float = 1.0,
    remain_alpha: float = 1.0,
    seed: int = 0,
    snapshot_hook: Callable | None = None,
    snapshot_freq: int = 200,
):
    """SFR-on concept erasure (SD/train-scripts/nsfw_removal.py:38-214).

    train_method freezing happens at the optimizer level (optax.masked —
    no state for frozen layers); the elementwise mask slot carries only the
    Fisher saliency mask."""
    opt = _method_optimizer(unet_params, train_method, lr)
    cfg = SFRonConfig(n_iters=n_iters, forget_alpha=forget_alpha,
                      remain_alpha=remain_alpha, alpha_sched="const",
                      forget_clip=None, remain_clip=None)
    step = make_sfron_step(cfg, opt, wl.nsfw_forget_loss_fn(),
                           wl.shared_step_loss)
    state = init_state(unet_params, opt, mask=saliency_mask)
    key = jax.random.key(seed)
    for i in range(n_iters):
        state, metrics = step(state, next(forget_batches),
                              next(remain_batches), key)
        if (i + 1) % snapshot_freq == 0:
            log.info("step %d forget %.4f remain %.4f", i,
                     float(metrics["forget_loss"]),
                     float(metrics["remain_loss"]))
            if snapshot_hook:
                snapshot_hook(state.params, i)
    return state.params


def _single_loss_loop(wl, unet_params, loss_fn, batches, *, n_iters, lr,
                      train_method="full", seed=0, prox=None, aux=None):
    """Generic single-loss loop. train_method freezing via optax.masked
    (frozen layers: no grads applied, no optimizer state). ``aux`` (e.g.
    frozen base params for ESD) is a jit ARGUMENT — parameter-sized closure
    constants become HLO literals and wreck TPU compiles."""
    opt = _method_optimizer(unet_params, train_method, lr)
    opt_state = jax.jit(opt.init)(unet_params)

    @jax.jit
    def step(params, opt_state, batch, k, aux):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, k, aux)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed)
    params = unet_params
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, next(batches), sub,
                                       aux)
        if prox is not None:
            params = prox(params)
    return params


def train_esd(wl: SDWorkload, unet_params, batches, *, n_iters=1000,
              lr=1e-5, train_method="xattn", negative_guidance=1.0, seed=0):
    """ESD erasure (SD/train-scripts/train-esd.py:129-340). ``batches``
    yields (z_t, t, ctx_concept, ctx_empty) built by partial denoising with
    the CURRENT model — see ``esd_batch_builder``."""
    frozen = jax.tree_util.tree_map(jnp.asarray, unet_params)
    return _single_loss_loop(
        wl, unet_params, wl.esd_loss_fn(negative_guidance), batches,
        n_iters=n_iters, lr=lr, train_method=train_method, seed=seed,
        aux=frozen)


def certain_label(wl: SDWorkload, unet_params, forget_batches,
                  remain_batches, *, n_iters=1000, lr=1e-5, seed=0,
                  remain_alpha=1.0, train_method="full"):
    """SalUn-style random/certain-label erasure
    (SD/train-scripts/random_label.py:13-155): pseudo-label forget MSE +
    remain loss in one update."""
    rl = wl.rl_forget_loss_fn()

    def combined(params, batch, rng, aux):
        fb, rb = batch
        k1, k2 = jax.random.split(rng)
        return rl(params, fb, k1) + remain_alpha * wl.shared_step_loss(
            params, rb, k2)

    paired = map(lambda fr: fr, zip(forget_batches, remain_batches))
    return _single_loss_loop(wl, unet_params, combined, paired,
                             n_iters=n_iters, lr=lr,
                             train_method=train_method, seed=seed)


def gradient_ascent(wl: SDWorkload, unet_params, forget_batches,
                    remain_batches, *, n_iters=1000, lr=1e-5,
                    remain_alpha=1.0, seed=0, train_method="full"):
    """-shared_step(forget) + alpha*shared_step(remain)
    (SD/train-scripts/gradient_ascent.py:14-123)."""
    ga = wl.ga_loss_fn(remain_alpha)
    loss = lambda p, b, k, aux: ga(p, b, k)
    paired = map(lambda fr: fr, zip(forget_batches, remain_batches))
    return _single_loss_loop(wl, unet_params, loss, paired, n_iters=n_iters,
                             lr=lr, train_method=train_method, seed=seed)


def proximal_gradient(wl: SDWorkload, unet_params, forget_batches,
                      remain_batches, *, n_iters=1000, lr=1e-5,
                      remain_alpha=1.0, top_ratio=0.01, seed=0):
    """Joint loss + per-step L1-prox shrink toward init
    (SD/train-scripts/proximal_gradient.py:18-197)."""
    ga = wl.ga_loss_fn(remain_alpha)
    loss = lambda p, b, k, aux: ga(p, b, k)
    prox = wl.make_prox_operator(
        jax.tree_util.tree_map(jnp.asarray, unet_params), top_ratio)
    paired = map(lambda fr: fr, zip(forget_batches, remain_batches))
    return _single_loss_loop(wl, unet_params, loss, paired, n_iters=n_iters,
                             lr=lr, seed=seed, prox=prox)
