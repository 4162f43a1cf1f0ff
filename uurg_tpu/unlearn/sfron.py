"""SFR-on: the fast-slow two-phase unlearning step, fused into ONE jit.

This is the framework's core. The reference implements the loop three times
(Classification/unlearn/sfron.py:189-259, DDPM/runners/diffusion.py:1075-1176,
DiT/forget.py:256-322); here a single step factory covers all of them:

    per iteration:
      [every forget_freq steps]  FORGET: grads of alpha(step) * forget_loss,
                                 multiplied by the saliency mask, clipped,
                                 applied through the shared optimizer state
      [every step]               REMAIN: grads of remain_alpha * remain_loss,
                                 optionally clipped, applied
      [every step]               EMA shadow update and/or fast-slow mixing

The whole thing — two value_and_grads, mask multiply, clips, two optimizer
applications, EMA lerp — is one XLA program: no host round-trips, no
named_parameters() loops, gradients averaged across the device mesh by the
loss-mean psum that pjit inserts.

``method="joint"`` (the paper's ablation, DDPM/runners/diffusion.py:1160-1167)
combines both losses into one masked update per step.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from uurg_tpu.core import tree as tr
from uurg_tpu.diffusion.losses import cosine_alpha_decay, linear_alpha_decay
from uurg_tpu.unlearn.ema import ema_update, fast_slow_mix

# loss_fn(params, batch, rng) -> scalar loss to MINIMIZE.
# Gradient-ascent methods pass a loss that is already negated (e.g.
# lambda p, b, k: -adaptive_loss(...)).
LossFn = Callable[[Any, Any, jax.Array], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SFRonConfig:
    n_iters: int
    forget_alpha: float
    remain_alpha: float = 1.0
    alpha_sched: str = "cosine"        # cosine | linear | expdecay | const
    forget_freq: int = 1               # forget step every N iters (cls: 5)
    forget_clip: Optional[float] = 1.0
    remain_clip: Optional[float] = 1.0  # None = no clip (classification)
    method: str = "ron"                # ron | joint
    ema_mu: Optional[float] = None     # DDPM/DiT shadow-EMA rate
    fast_slow_beta: Optional[float] = None  # classification mixing beta
    grad_accum: int = 1                # microbatches accumulated per update


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SFRonState:
    step: jnp.ndarray          # int32 scalar
    params: Any
    opt_state: Any
    ema_params: Any            # shadow params or None
    model_state: Any = None    # mutable collections (e.g. BatchNorm stats)
    mask: Any = None           # saliency mask (0/1 float pytree) or None

    # The mask lives in the state (a jit ARGUMENT) rather than being closed
    # over by the step: closure constants of parameter size get embedded as
    # HLO literals, which explodes compile time and can exceed backend
    # program limits. It rides through each donated step unchanged.


def init_state(params, optimizer: optax.GradientTransformation,
               ema: bool = False, model_state=None, mask=None,
               ema_dtype=None) -> SFRonState:
    """``ema_dtype`` (e.g. bfloat16) halves the shadow-param memory — with
    ``mu_dtype`` on the optimizer this fits DiT-XL/2 on one 16GB chip."""
    opt_state = jax.jit(optimizer.init)(params)  # single device dispatch
    # fresh copies: the step donates its input state, which would otherwise
    # invalidate the caller's params buffers (and ema must not alias params)
    # jnp.copy forces a fresh buffer WITHOUT dtype promotion (``x + 0``
    # would type-promote bool mask leaves to int32 — 4x the mask memory)
    copy = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
    ema_params = None
    if ema:
        ema_params = jax.jit(lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(ema_dtype) if ema_dtype else jnp.copy(x),
            t))(params)
    return SFRonState(
        step=jnp.zeros((), jnp.int32),
        params=copy(params),
        opt_state=opt_state,
        ema_params=ema_params,
        model_state=copy(model_state) if model_state is not None else None,
        # the mask rides through donated steps too: without a fresh copy
        # the FIRST step deletes the caller's mask buffers
        mask=copy(mask) if mask is not None else None,
    )


def _alpha_at(cfg: SFRonConfig, step):
    if cfg.alpha_sched == "cosine":
        return cosine_alpha_decay(cfg.forget_alpha, step, cfg.n_iters)
    if cfg.alpha_sched == "linear":
        return linear_alpha_decay(cfg.forget_alpha, step, cfg.n_iters, 1.0)
    if cfg.alpha_sched == "expdecay":
        return linear_alpha_decay(cfg.forget_alpha, step, cfg.n_iters, 2.0)
    if cfg.alpha_sched == "const":
        return jnp.asarray(cfg.forget_alpha, jnp.float32)
    raise NotImplementedError(cfg.alpha_sched)


def make_sfron_step(
    cfg: SFRonConfig,
    optimizer: optax.GradientTransformation,
    forget_loss_fn: LossFn,
    remain_loss_fn: LossFn,
    lr_schedule: Callable | None = None,
    donate: bool = True,
    has_model_state: bool = False,
    jit: bool = True,
):
    """Build the jitted two-phase step.

    Returns ``step_fn(state, forget_batch, remain_batch, rng) ->
    (new_state, metrics)``. The saliency mask (float 0/1 pytree or None)
    comes in via ``state.mask`` — a jit argument, never a closure constant.
    ``lr_schedule`` (step -> lr) drives optimizers built via
    optax.inject_hyperparams.

    With ``has_model_state=True`` the loss fns take/return mutable model
    collections (BatchNorm running stats):
    ``loss_fn(params, model_state, batch, rng) -> (loss, new_model_state)``
    — the reference keeps models in train mode during both phases
    (Classification/unlearn/sfron.py:190,213) so BN stats update throughout.
    """

    def scaled_update(grads, opt_state, params, clip):
        if clip is not None:
            grads, gnorm = tr.clip_by_global_norm(grads, clip)
        else:
            gnorm = tr.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, gnorm

    def step_fn(state: SFRonState, forget_batch, remain_batch, rng):
        k_forget, k_remain = jax.random.split(jax.random.fold_in(rng, state.step))
        cur_alpha = _alpha_at(cfg, state.step)
        params_prev = state.params
        mask = state.mask  # None-ness is static (part of the pytree struct)

        if lr_schedule is not None:
            state.opt_state.hyperparams["learning_rate"] = lr_schedule(state.step)
        opt_state = state.opt_state

        def eval_loss(loss_fn, params, mstate, batch, key):
            """Uniform (loss, new_model_state) interface."""
            if has_model_state:
                return loss_fn(params, mstate, batch, key)
            return loss_fn(params, batch, key), mstate

        n_accum = max(int(cfg.grad_accum), 1)

        def vag(loss_fn, params, mstate, batch, key):
            """(loss, grads, new_mstate), with microbatch accumulation.

            With ``grad_accum > 1`` the batch leaves carry a leading
            [grad_accum] axis (see :func:`stack_microbatches`); a lax.scan
            sums losses and f32 gradients over the microbatches and divides
            by the count — identical to one big batch for mean-reduced
            losses, at 1/grad_accum of the activation memory. The RNG folds
            in the microbatch index so every slice draws fresh
            noise/timesteps; model_state (BN stats) threads sequentially,
            like consecutive host steps would. One optimizer update per
            step either way.
            """
            if n_accum == 1:
                (loss, mstate), grads = jax.value_and_grad(
                    lambda p: eval_loss(loss_fn, p, mstate, batch, key),
                    has_aux=True)(params)
                return loss, grads, mstate

            gz = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), params)

            def body(carry, xs):
                ms, lsum, gsum = carry
                mb, i = xs
                (l, ms), g = jax.value_and_grad(
                    lambda p: eval_loss(loss_fn, p, ms, mb,
                                        jax.random.fold_in(key, i)),
                    has_aux=True)(params)
                gsum = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), gsum, g)
                return (ms, lsum + l, gsum), None

            (mstate, lsum, gsum), _ = jax.lax.scan(
                body, (mstate, jnp.zeros((), jnp.float32), gz),
                (batch, jnp.arange(n_accum)))
            inv = 1.0 / n_accum
            grads = jax.tree_util.tree_map(
                lambda g, p: (g * inv).astype(p.dtype), gsum, params)
            return lsum * inv, grads, mstate

        def forget_grads(params, mstate):
            loss, grads, mstate = vag(forget_loss_fn, params, mstate,
                                      forget_batch, k_forget)
            grads = tr.tree_scale(grads, cur_alpha)
            if mask is not None:
                grads = tr.tree_mul(grads, mask)
            return loss, grads, mstate

        # Statically disabled forgetting (pretrain/retrain reuse this engine
        # with forget_alpha=0): the forget phase must not merely contribute
        # zero gradients — optax's Adam on all-zero grads still decays the
        # first moment and double-increments the bias-correction count, i.e.
        # a phantom extra update per step vs the reference's single
        # optimizer.step() (DDPM/runners/diffusion.py:138-158). Skip the
        # phase entirely at trace time.
        forget_off = cfg.alpha_sched == "const" and cfg.forget_alpha == 0.0

        if cfg.method == "ron" and forget_off:
            params, opt_state, mstate, forget_loss = (
                state.params, opt_state, state.model_state,
                jnp.zeros((), jnp.float32))

            remain_loss, rgrads, mstate = vag(remain_loss_fn, params,
                                              mstate, remain_batch, k_remain)
            rgrads = tr.tree_scale(rgrads, cfg.remain_alpha)
            params, opt_state, rnorm = scaled_update(
                rgrads, opt_state, params, cfg.remain_clip)

        elif cfg.method == "ron":
            def do_forget(operand):
                params, opt_state, mstate = operand
                loss, grads, mstate = forget_grads(params, mstate)
                params, opt_state, gnorm = scaled_update(
                    grads, opt_state, params, cfg.forget_clip)
                return params, opt_state, mstate, loss

            if cfg.forget_freq > 1:
                params, opt_state, mstate, forget_loss = jax.lax.cond(
                    state.step % cfg.forget_freq == 0,
                    do_forget,
                    lambda op: (op[0], op[1], op[2],
                                jnp.zeros((), jnp.float32)),
                    (state.params, opt_state, state.model_state),
                )
            else:
                params, opt_state, mstate, forget_loss = do_forget(
                    (state.params, opt_state, state.model_state))

            remain_loss, rgrads, mstate = vag(remain_loss_fn, params,
                                              mstate, remain_batch, k_remain)
            rgrads = tr.tree_scale(rgrads, cfg.remain_alpha)
            params, opt_state, rnorm = scaled_update(
                rgrads, opt_state, params, cfg.remain_clip)

        elif cfg.method == "joint":
            # single combined masked update (paper ablation). NOTE: the
            # reference's joint branch applies the mask to stale gradients
            # (DDPM/runners/diffusion.py:1162-1167 masks before backward);
            # we implement the intended semantics: mask the combined grads.
            # Gradients are linear, so grad(a*fl + r*rl) computed as two
            # value_and_grads at the SAME params equals the combined
            # backward — and composes with microbatch accumulation for free.
            forget_loss, fgrads, mstate = vag(
                forget_loss_fn, state.params, state.model_state,
                forget_batch, k_forget)
            remain_loss, rgrads, mstate = vag(
                remain_loss_fn, state.params, mstate, remain_batch, k_remain)
            grads = jax.tree_util.tree_map(
                lambda a, b: cur_alpha * a + cfg.remain_alpha * b,
                fgrads, rgrads)
            if mask is not None:
                grads = tr.tree_mul(grads, mask)
            params, opt_state, rnorm = scaled_update(
                grads, opt_state, state.params, cfg.remain_clip)
        else:
            raise NotImplementedError(cfg.method)

        if cfg.fast_slow_beta is not None and cfg.fast_slow_beta != 1.0:
            params = fast_slow_mix(params, params_prev, cfg.fast_slow_beta)

        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, cfg.ema_mu)

        new_state = SFRonState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            model_state=mstate,
            mask=mask,
        )
        metrics = {
            "forget_loss": forget_loss,
            "remain_loss": remain_loss,
            "forget_alpha": cur_alpha,
            "remain_grad_norm": rnorm,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def stack_microbatches(batches, n: int):
    """Wrap a batch iterator for ``SFRonConfig.grad_accum=n``: each yield
    stacks ``n`` consecutive batches along a new leading axis, so the step
    sees leaves of shape [n, batch, ...] and scans over them. Effective
    batch = n x batch_size at the activation memory of ONE batch — how the
    860M SD UNet trains at reference-scale effective batches on a single
    16GB chip."""
    batches = iter(batches)  # accept any iterable, not just iterators
    if n <= 1:
        yield from batches
        return
    while True:
        group = []
        for _ in range(n):
            try:
                group.append(next(batches))
            except StopIteration:  # finite iterator: drop the ragged tail
                return
        yield jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *group)


def make_sfron_scan(cfg, optimizer, forget_loss_fn, remain_loss_fn,
                    chunk: int, device_batcher=None, **kwargs):
    """Chunked SFR-on: run ``chunk`` two-phase steps per dispatch as one
    ``lax.scan``.

    Why: a host loop pays a host-to-device transfer per batch; through a
    high-latency, low-bandwidth link (remote-TPU tunnel, DCN-fed pods)
    that bounds throughput far below the device step rate (measured 3-7
    it/s host-loop vs ~110 it/s device-resident on the classification
    workload, bf16).

    Two modes:
    - ``device_batcher=None``: consume pre-stacked batch chunks of shape
      ``(chunk, batch, ...)`` — ``run(state, f_chunk, r_chunk, rng)``.
      The per-step RNG folds in ``state.step`` exactly like the per-step
      path, so the stream is IDENTICAL to ``make_sfron_step`` repeated.
    - ``device_batcher=draw``: the full (images, labels) datasets live on
      DEVICE; every scan step draws/augments its batch in-jit —
      ``run(state, f_data, r_data, rng)``. Zero per-step transfers.
    """
    step_fn = make_sfron_step(cfg, optimizer, forget_loss_fn,
                              remain_loss_fn, jit=False, donate=False,
                              **kwargs)

    if device_batcher is None:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state, f_chunk, r_chunk, rng):
            def body(st, xs):
                fb, rb = xs
                st, metrics = step_fn(st, fb, rb, rng)
                return st, metrics

            return jax.lax.scan(body, state, (f_chunk, r_chunk))

        return run

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_resident(state, f_data, r_data, rng):
        def body(st, _):
            kb = jax.random.fold_in(jax.random.fold_in(rng, st.step), 0x5F)
            kf, kr = jax.random.split(kb)
            fb = device_batcher(f_data, kf)
            rb = device_batcher(r_data, kr)
            st, metrics = step_fn(st, fb, rb, rng)
            return st, metrics

        return jax.lax.scan(body, state, None, length=chunk)

    return run_resident
