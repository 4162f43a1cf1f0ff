"""Host-side SD erasure runners (reference SD/train-scripts parity).

Each runner wires an SDWorkload's jitted losses into a training loop:
``nsfw_removal`` uses the shared SFR-on engine (two-phase masked update);
``train_esd``, ``certain_label``, ``gradient_ascent``, ``proximal_gradient``
are single-loss loops with method-specific batch construction.

Data enters as pre-encoded latents + contexts (the VAE/CLIP encodes are
jitted, frozen forwards) — see ``encode_image_folder``.
"""
from __future__ import annotations

import contextlib
import logging
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uurg_tpu.core.tree import mask_is_packed
from uurg_tpu.models.autoencoder_kl import AutoencoderKL
from uurg_tpu.models.sd_unet import train_method_leaf_mask
from uurg_tpu.train import make_optimizer
from uurg_tpu.unlearn import (SFRonConfig, make_sfron_step,
                              stack_microbatches)
from uurg_tpu.unlearn.sfron import init_state
from uurg_tpu.workloads.sd import SDWorkload

log = logging.getLogger("uurg.sd")


def _method_optimizer(unet_params, train_method: str, lr: float,
                      nu_dtype=None):
    """Adam over the train_method parameter subset only; frozen layers get
    optax.set_to_zero (no update, NO optimizer state — fits the 860M UNet on
    16GB), exactly the reference's param-group selection
    (SD/train-scripts/nsfw_removal.py:67-81). ``nu_dtype=bf16`` halves the
    second moment too (train_method=full: -1.7GB)."""
    base = make_optimizer("adam", lr, mu_dtype=jnp.bfloat16,
                          nu_dtype=nu_dtype)
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
    mesh=None,                 # jax.sharding.Mesh for multi-chip training
    parallelism: str = "dp",   # "dp" | "fsdp" | "tp" (SD_TP_RULES +
                               # fsdp fallback for convs; docs/SCALING.md)
                               # | "sp" (ring attention over 'seq')
    grad_accum: int = 1,       # microbatches per optimizer update
    nu_dtype=None,             # Adam second-moment dtype (bf16: -1.7GB
                               # at train_method=full)
    pack_mask: bool = False,   # bit-pack the saliency mask 8x
):
    """SFR-on concept erasure (SD/train-scripts/nsfw_removal.py:38-214).

    train_method freezing happens at the optimizer level (optax.masked —
    no state for frozen layers); the elementwise mask slot carries only the
    Fisher saliency mask."""
    opt = _method_optimizer(unet_params, train_method, lr,
                            nu_dtype=nu_dtype)
    if pack_mask and saliency_mask is not None:
        from uurg_tpu.core.tree import pack_mask as _pack

        saliency_mask = _pack(saliency_mask)
    cfg = SFRonConfig(n_iters=n_iters, forget_alpha=forget_alpha,
                      remain_alpha=remain_alpha, alpha_sched="const",
                      forget_clip=None, remain_clip=None,
                      grad_accum=grad_accum)
    step = make_sfron_step(cfg, opt, wl.nsfw_forget_loss_fn(),
                           wl.shared_step_loss)
    if grad_accum > 1:  # effective batch = grad_accum x batch_size
        forget_batches = stack_microbatches(forget_batches, grad_accum)
        remain_batches = stack_microbatches(remain_batches, grad_accum)
    state = init_state(unet_params, opt, mask=saliency_mask)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from uurg_tpu.parallel import (
            SD_TP_RULES, shard_batch, shard_params_fsdp, shard_params_tp)

        state = jax.device_put(state, NamedSharding(mesh, P()))
        # opt_state (Adam mu/nu under optax.masked) and the saliency mask
        # shard with the same specs as the params — fsdp_spec is shape-only
        # and the TP rules match the param-path tail that mu/nu/mask leaf
        # paths end with (ZeRO-style: no replicated optimizer state).
        if parallelism == "fsdp":
            for f in ("params", "opt_state", "mask"):
                if f == "mask" and mask_is_packed(state.mask):
                    continue  # packed bits don't match param specs;
                              # replicated at 1 bit/elem is cheap (keyed
                              # off the tree's leaves, not the pack_mask
                              # flag — callers may pass pre-packed masks)
                if getattr(state, f) is not None:
                    setattr(state, f, shard_params_fsdp(getattr(state, f),
                                                        mesh))
        elif parallelism == "tp":
            for f in ("params", "opt_state", "mask"):
                if f == "mask" and mask_is_packed(state.mask):
                    continue  # packed bits don't match param specs;
                              # replicated at 1 bit/elem is cheap (keyed
                              # off the tree's leaves, not the pack_mask
                              # flag — callers may pass pre-packed masks)
                if getattr(state, f) is not None:
                    setattr(state, f, shard_params_tp(
                        getattr(state, f), mesh, SD_TP_RULES,
                        fallback="fsdp"))
        elif parallelism == "sp":
            # sequence parallelism: the SD UNet's 64x64-latent
            # self-attention (T=4096) routes through ring attention with
            # tokens sharded over 'seq' (parallel/sequence.py); the
            # sequence_parallel context wraps the loop so the step traces
            # inside it. Cross-attention K/V (77 text tokens) falls back to
            # the local kernel automatically (T % seq != 0 guard in the
            # dispatcher).
            if "seq" not in mesh.shape:
                raise ValueError(
                    "parallelism='sp' needs a 'seq' mesh axis — pass e.g. "
                    "--mesh seq=4 or --mesh data=2,seq=4")
        elif parallelism != "dp":
            raise ValueError(f"unknown parallelism {parallelism!r}")

        # grad-accum-stacked batches are [grad_accum, B, ...]: the scan axis
        # stays whole per device and the TRUE batch axis (dim 1) shards
        _bdim = 1 if grad_accum > 1 else 0

        def _place(b):
            return shard_batch(b, mesh, batch_dim=_bdim)
    else:
        def _place(b):
            return b
    if mesh is not None and parallelism == "sp":
        from uurg_tpu.parallel import sequence_parallel

        sp_ctx = sequence_parallel(mesh)
    else:
        sp_ctx = contextlib.nullcontext()
    key = jax.random.key(seed)
    with sp_ctx:
        for i in range(n_iters):
            state, metrics = step(state, _place(next(forget_batches)),
                                  _place(next(remain_batches)), key)
            if (i + 1) % snapshot_freq == 0:
                log.info("step %d forget %.4f remain %.4f", i,
                         float(metrics["forget_loss"]),
                         float(metrics["remain_loss"]))
                if snapshot_hook:
                    snapshot_hook(state.params, i)
    return state.params


def _single_loss_loop(wl, unet_params, loss_fn, batches, *, n_iters, lr,
                      train_method="full", seed=0, prox=None, aux=None,
                      saliency_mask=None, loss_sink=None):
    """Generic single-loss loop. train_method freezing via optax.masked
    (frozen layers: no grads applied, no optimizer state). ``aux`` (e.g.
    frozen base params for ESD) is a jit ARGUMENT — parameter-sized closure
    constants become HLO literals and wreck TPU compiles.

    ``batches`` is either an iterator of ready batches or a callable
    ``(params, key) -> batch`` for methods whose data depends on the CURRENT
    params (ESD partial denoising).  ``saliency_mask`` multiplies the grads
    elementwise before the update (train-esd.py:319-324 mask_path)."""
    opt = _method_optimizer(unet_params, train_method, lr)
    opt_state = jax.jit(opt.init)(unet_params)

    @jax.jit
    def step(params, opt_state, batch, k, aux, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, k, aux)
        if mask is not None:
            grads = jax.tree_util.tree_map(jnp.multiply, grads, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed)
    params = unet_params
    for i in range(n_iters):
        key, k_b, k_s = jax.random.split(key, 3)
        batch = batches(params, k_b) if callable(batches) else next(batches)
        params, opt_state, loss = step(params, opt_state, batch, k_s, aux,
                                       saliency_mask)
        if prox is not None:
            params = prox(params)
        if loss_sink is not None:
            loss_sink(i, loss)
    return params


def esd_batch_builder(wl: SDWorkload, ctx_concept, ctx_empty, *,
                      ddim_steps: int = 50, start_guidance: float = 3.0,
                      latent_size: int = 64, batch_size: int = 1):
    """ESD training-batch construction (train-esd.py:266-301): per call,
    draw a DDIM index ``t_enc``, partially denoise a fresh start code with
    the CURRENT params via ``quick_sample_till_t`` at ``start_guidance``,
    and draw the DDPM timestep uniformly inside t_enc's bucket
    (``og_num = t_enc/S*T .. (t_enc+1)/S*T``).

    Returns ``build(params, key) -> (z_t, t_ddpm, ctx_concept, ctx_empty)``,
    fully jitted (the dynamic-length denoise is a fori_loop, so one compile
    covers every t_enc)."""
    quick = wl.make_quick_sampler(ddim_steps=ddim_steps,
                                  start_guidance=start_guidance)
    T = wl.schedule.num_timesteps
    ctx_c = jnp.broadcast_to(ctx_concept, (batch_size,) + ctx_concept.shape[-2:])
    ctx_0 = jnp.broadcast_to(ctx_empty, (batch_size,) + ctx_empty.shape[-2:])

    @jax.jit
    def build(params, key):
        k_enc, k_t, k_code = jax.random.split(key, 3)
        t_enc = jax.random.randint(k_enc, (), 0, ddim_steps)
        lo = t_enc * T // ddim_steps
        hi = (t_enc + 1) * T // ddim_steps
        t_ddpm = jax.random.randint(k_t, (batch_size,), 0, hi - lo) + lo
        x_T = jax.random.normal(
            k_code, (batch_size, latent_size, latent_size, 4), jnp.float32)
        z = quick(params, ctx_c, ctx_0, x_T, t_enc)
        return jax.lax.stop_gradient(z), t_ddpm, ctx_c, ctx_0

    return build


def train_esd(wl: SDWorkload, unet_params, batches, *, n_iters=1000,
              lr=1e-5, train_method="xattn", negative_guidance=1.0, seed=0,
              saliency_mask=None):
    """ESD erasure (SD/train-scripts/train-esd.py:129-340). ``batches``
    yields (z_t, t, ctx_concept, ctx_empty); pass ``esd_batch_builder(...)``
    (a callable seeing the CURRENT params) for the reference's
    partial-denoise training distribution."""
    frozen = jax.tree_util.tree_map(jnp.asarray, unet_params)
    return _single_loss_loop(
        wl, unet_params, wl.esd_loss_fn(negative_guidance), batches,
        n_iters=n_iters, lr=lr, train_method=train_method, seed=seed,
        aux=frozen, saliency_mask=saliency_mask)


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
