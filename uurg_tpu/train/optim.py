"""Optax optimizer factories matching the reference's torch optimizers.

torch.optim semantics replicated exactly:
- Adam with ``weight_decay`` is L2-on-gradient (coupled), so decay is added
  BEFORE the Adam moment update (unlike optax.adamw).
- SGD(momentum, weight_decay) is grad += wd*p; buf = m*buf + grad.
- AdamW is decoupled decay (optax.adamw).

All optimizers are wrapped in ``optax.inject_hyperparams`` so a jitted train
step can drive the learning rate from its own step counter — needed because
the SFR-on step applies the optimizer TWICE per iteration (forget + remain)
while the reference's lr scheduler ticks once per iteration
(Classification/unlearn/sfron.py:172-174,259).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_annealing(base_lr: float, total_steps: int):
    """torch CosineAnnealingLR / reference cosine_lr_scheduler:
    lr(t) = base * (1 + cos(pi * t / T)) / 2."""

    def sched(step):
        return base_lr * (1.0 + jnp.cos(jnp.pi * step / total_steps)) / 2.0

    return sched


def _sgd(learning_rate, momentum=0.9, weight_decay=0.0):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def scale_by_adam_dtypes(b1=0.9, b2=0.999, eps=1e-8,
                         mu_dtype=None, nu_dtype=None):
    """optax.scale_by_adam semantics with BOTH moment dtypes selectable.

    optax only exposes ``mu_dtype``; storing ``nu`` in bfloat16 as well
    frees another 4 bytes/param (DiT-XL/2: 2.7GB) — the headroom that lets
    the "dots" remat policy fit on one 16GB chip. Moment math runs in f32;
    only the carried state is downcast (bf16 nu => ~0.4% relative error on
    the second moment, ~0.2% on the Adam denominator)."""
    import jax

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda m, g: (b1 * m.astype(f32)
                          + (1 - b1) * g.astype(f32)).astype(
                              mu_dtype or g.dtype),
            state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: (b2 * v.astype(f32)
                          + (1 - b2) * jnp.square(g.astype(f32))).astype(
                              nu_dtype or g.dtype),
            state.nu, updates)
        count = optax.safe_increment(state.count)
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        new_updates = jax.tree_util.tree_map(
            lambda m, v, g: ((m.astype(f32) / bc1)
                             / (jnp.sqrt(v.astype(f32) / bc2) + eps)
                             ).astype(g.dtype),
            mu, nu, updates)
        return new_updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _adam_l2(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
             amsgrad=False, mu_dtype=None, nu_dtype=None):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if amsgrad:
        if nu_dtype is not None:
            # fail loudly instead of silently keeping nu in f32 — the
            # "adam/adamw only" note on make_optimizer is now enforced
            raise NotImplementedError(
                "nu_dtype is not supported with amsgrad (optax's "
                "scale_by_amsgrad keeps nu/nu_max in f32)")
        parts.append(optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps,
                                            mu_dtype=mu_dtype))
    elif nu_dtype is not None:
        parts.append(scale_by_adam_dtypes(b1=b1, b2=b2, eps=eps,
                                          mu_dtype=mu_dtype,
                                          nu_dtype=nu_dtype))
    else:
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                         mu_dtype=mu_dtype))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def _adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
           mu_dtype=None, nu_dtype=None):
    if nu_dtype is not None:
        return optax.chain(
            scale_by_adam_dtypes(b1=b1, b2=b2, eps=eps,
                                 mu_dtype=mu_dtype, nu_dtype=nu_dtype),
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(learning_rate))
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay, mu_dtype=mu_dtype)


def make_optimizer(
    name: str,
    lr: float,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    amsgrad: bool = False,
    mu_dtype=None,
    nu_dtype=None,
) -> optax.GradientTransformation:
    """``mu_dtype`` (e.g. jnp.bfloat16) halves the first-moment memory —
    needed to fit DiT-XL/2 (675M) with full Adam+EMA state on one 16GB chip.
    ``nu_dtype`` does the same for the second moment (adam/adamw only; see
    scale_by_adam_dtypes) — opt-in, slightly perturbs the Adam denominator.
    """
    name = name.lower()
    # only learning_rate is injected (mutable inside jit); everything else
    # stays a static python constant so factory `if`s trace correctly
    if name == "sgd":
        return optax.inject_hyperparams(
            _sgd, static_args=("momentum", "weight_decay"))(
            learning_rate=lr, momentum=momentum, weight_decay=weight_decay)
    if name == "adam":
        return optax.inject_hyperparams(
            _adam_l2, static_args=("b1", "b2", "eps", "weight_decay",
                                   "amsgrad", "mu_dtype", "nu_dtype"))(
            learning_rate=lr, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, amsgrad=amsgrad, mu_dtype=mu_dtype,
            nu_dtype=nu_dtype)
    if name == "adamw":
        return optax.inject_hyperparams(
            _adamw, static_args=("b1", "b2", "eps", "weight_decay",
                                 "mu_dtype", "nu_dtype"))(
            learning_rate=lr, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mu_dtype=mu_dtype, nu_dtype=nu_dtype)
    raise NotImplementedError(f"Optimizer {name!r}")


def build_reference_optimizer(cfg, mu_dtype=None,
                              nu_dtype=None) -> optax.GradientTransformation:
    """From a reference-schema ``optim`` config section
    (DDPM/functions/__init__.py get_optimizer parity). ``mu_dtype`` /
    ``nu_dtype`` are the memory-policy knobs (halve the Adam moments;
    adam/adamw only — amsgrad raises, see _adam_l2)."""
    o = cfg.optim
    return make_optimizer(
        o.optimizer,
        o.lr,
        weight_decay=o.get("weight_decay", 0.0),
        beta1=o.get("beta1", 0.9),
        eps=o.get("eps", 1e-8),
        amsgrad=o.get("amsgrad", False),
        mu_dtype=mu_dtype,
        nu_dtype=nu_dtype,
    )
