"""DDPM workload: conditional CIFAR-10 diffusion training + SFR-on forgetting.

This is the glue the reference spreads across DDPM/runners/diffusion.py's
1,363-line god object. Everything compute-shaped here is a pure function
suitable for jit/pjit; the host side (loops, checkpoints, logging) lives in
the CLI layer.

Batch convention: ``(x, c)`` with x float32 NHWC already in model range
([-1, 1] after data_transform) and c int32 class labels.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from uurg_tpu.core.rng import antithetic_timesteps, cond_keep_mask
from uurg_tpu.diffusion import (
    DiffusionSchedule,
    adaptive_loss,
    make_schedule,
    noise_estimation_loss,
)
from uurg_tpu.diffusion import sampling as S
from uurg_tpu.models.unet_cond import CondUNet, UNetConfig, init_unet


@dataclasses.dataclass
class DDPMWorkload:
    """Bundles model, schedule and loss builders for one reference config."""

    model: CondUNet
    schedule: DiffusionSchedule
    unet_cfg: UNetConfig
    lambd: float = 0.5
    cond_drop_prob: float = 0.1

    @classmethod
    def from_config(cls, cfg, dtype=jnp.bfloat16) -> "DDPMWorkload":
        unet_cfg = UNetConfig.from_config(cfg, dtype=dtype)
        schedule = make_schedule(
            cfg.diffusion.beta_schedule,
            cfg.diffusion.beta_start,
            cfg.diffusion.beta_end,
            cfg.diffusion.num_diffusion_timesteps,
            var_type=cfg.model.get("var_type", "fixedlarge"),
        )
        return cls(
            model=CondUNet(unet_cfg),
            schedule=schedule,
            unet_cfg=unet_cfg,
            lambd=cfg.training.get("lambd", 0.5),
            cond_drop_prob=cfg.model.get("cond_drop_prob", 0.1),
        )

    def init_params(self, key: jax.Array):
        _, params = init_unet(key, self.unet_cfg)
        return params

    # -- loss builders -----------------------------------------------------

    def _per_sample_eps_loss(self, params, batch, rng, *, train: bool):
        """Antithetic-t conditional eps loss, per-sample
        (DDPM/functions/losses.py:22-38 + runners/diffusion.py:1091-1094)."""
        x, c = batch
        n = x.shape[0]
        k_t, k_noise, k_drop, k_dropout = jax.random.split(rng, 4)
        t = antithetic_timesteps(k_t, n, self.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, x.shape, jnp.float32)
        keep = cond_keep_mask(k_drop, n, self.cond_drop_prob if train else 0.0)

        def apply_fn(x_t, t_vec):
            return self.model.apply(
                {"params": params}, x_t, t_vec, c, keep,
                train=train, rngs={"dropout": k_dropout} if train else {},
            )

        return noise_estimation_loss(
            apply_fn, self.schedule, x, t, noise, keepdim=True)

    def train_loss_fn(self) -> Callable:
        """Mean eps-loss — pretrain/retrain/remain objective."""

        def fn(params, batch, rng):
            return self._per_sample_eps_loss(params, batch, rng,
                                             train=True).mean()

        return fn

    def adaga_forget_loss_fn(self) -> Callable:
        """Negated adaptive gradient-ascent loss (``unlearn_loss=adaga``,
        DDPM/runners/diffusion.py:1115-1119)."""

        def fn(params, batch, rng):
            per = self._per_sample_eps_loss(params, batch, rng, train=True)
            return -adaptive_loss(per, self.lambd, eps=1e-8)

        return fn

    def ga_forget_loss_fn(self) -> Callable:
        """Plain negated eps-loss (``unlearn_loss=ga``)."""

        def fn(params, batch, rng):
            return -self._per_sample_eps_loss(params, batch, rng,
                                              train=True).mean()

        return fn

    def rl_forget_loss_fn(self, label_to_forget: int, n_classes: int = 10) -> Callable:
        """Random/pseudo-label forgetting (``unlearn_loss=rl``,
        DDPM/runners/diffusion.py:1101-1113): match the forget-class output
        to the detached prediction under a pseudo class."""
        pseudo_label = (label_to_forget + 1) % n_classes

        def fn(params, batch, rng):
            x, c = batch
            n = x.shape[0]
            k_t, k_noise, k_dropout = jax.random.split(rng, 3)
            t = antithetic_timesteps(k_t, n, self.schedule.num_timesteps)
            noise = jax.random.normal(k_noise, x.shape, jnp.float32)
            x_t = self.schedule.q_sample(x, t, noise)
            keep = jnp.ones((n,), bool)
            out = self.model.apply(
                {"params": params}, x_t, t, c, keep, train=True,
                rngs={"dropout": k_dropout})
            pseudo_c = jnp.full_like(c, pseudo_label)
            pseudo = self.model.apply(
                {"params": params}, x_t, t, pseudo_c, keep, train=True,
                rngs={"dropout": k_dropout})
            pseudo = jax.lax.stop_gradient(pseudo)
            return jnp.mean(jnp.square(pseudo - out))

        return fn

    def forget_loss_fn(self, unlearn_loss: str, label_to_forget: int = 0,
                       n_classes: int = 10) -> Callable:
        if unlearn_loss == "adaga":
            return self.adaga_forget_loss_fn()
        if unlearn_loss == "ga":
            return self.ga_forget_loss_fn()
        if unlearn_loss == "rl":
            return self.rl_forget_loss_fn(label_to_forget, n_classes)
        raise NotImplementedError(unlearn_loss)

    # -- SA (Selective Amnesia, EWC) ---------------------------------------

    def sa_loss_fn(self, label_to_forget: int, gamma: float,
                   lmbda: float) -> Callable:
        """SA forgetting loss (DDPM/runners/diffusion.py:354-477 sa_forget):
        eps-loss on uniform-noise images conditioned on the forgotten class
        + gamma * eps-loss on 'remember' samples (no cond dropout), plus the
        EWC quadratic pull toward the MLE params weighted by the FIM.

        ``aux = (fisher_dict, params_mle)`` arrives as a jit argument.
        """

        def fn(params, batch, rng, aux):
            fisher, params_mle = aux
            x_rem, c_rem = batch
            n = x_rem.shape[0]
            k_u, k_t, k_ef, k_er = jax.random.split(rng, 4)
            x_forget = jax.random.uniform(
                k_u, x_rem.shape, jnp.float32, -1.0, 1.0)
            c_forget = jnp.full((n,), label_to_forget, jnp.int32)
            t = antithetic_timesteps(k_t, n, self.schedule.num_timesteps)
            keep = jnp.ones((n,), bool)  # cond_drop_prob = 0

            def apply_for(c):
                return lambda x_t, t_vec: self.model.apply(
                    {"params": params}, x_t, t_vec, c, keep, train=False)

            noise_f = jax.random.normal(k_ef, x_rem.shape, jnp.float32)
            noise_r = jax.random.normal(k_er, x_rem.shape, jnp.float32)
            loss = noise_estimation_loss(
                apply_for(c_forget), self.schedule, x_forget, t, noise_f)
            loss += gamma * noise_estimation_loss(
                apply_for(c_rem), self.schedule, x_rem, t, noise_r)
            ewc = sum(
                jnp.sum(f * jnp.square(p - m)) for f, p, m in zip(
                    jax.tree_util.tree_leaves(fisher),
                    jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_mle)))
            return loss + lmbda * ewc

        return fn

    def elbo_chunk_loss_fn(self) -> Callable:
        """Mean eps-loss over a timestep chunk for ONE example — the
        per-sample full-ELBO FIM integrand (DDPM/fim.py + runners/
        diffusion.py:262-352 save_fim, chunked over t). The timestep chunk
        travels IN the example tuple ``(x, c, ts)`` so every chunk shares one
        compiled program (a closure constant per chunk would force a
        recompile per chunk). Use with
        uurg_tpu.unlearn.make_per_sample_fisher_step."""

        def fn(params, example, rng):
            x, c, ts = example  # (H, W, C), scalar label, (chunk,) int32
            noise = jax.random.normal(rng, (ts.shape[0],) + x.shape)
            x_b = jnp.broadcast_to(x, noise.shape)
            c_b = jnp.full((ts.shape[0],), c, jnp.int32)
            keep = jnp.ones((ts.shape[0],), bool)

            def apply_fn(x_t, t_vec):
                return self.model.apply({"params": params}, x_t, t_vec, c_b,
                                        keep, train=False)

            return noise_estimation_loss(
                apply_fn, self.schedule, x_b, ts, noise)

        return fn

    # -- sampling ----------------------------------------------------------

    def make_sampler(self, *, num_steps: int = 50, cond_scale: float = 2.0,
                     method: str = "ddim", eta: float = 0.0) -> Callable:
        """Jittable ``sample(params, labels, key) -> x in [-1, 1]``.

        Reference: DDPM/runners/diffusion.py:825-872 sample_image (respaced
        DDIM "generalized" or ancestral) with CFG double-forward.
        """
        seq = S.make_step_sequence(self.schedule.num_timesteps, num_steps)

        def sample(params, labels, key):
            n = labels.shape[0]
            k_init, k_samp = jax.random.split(key)
            shape = (n, self.unet_cfg.resolution, self.unet_cfg.resolution,
                     self.unet_cfg.in_channels)
            x_T = jax.random.normal(k_init, shape, jnp.float32)

            def apply_fn(x, t, c, keep):
                return self.model.apply({"params": params}, x, t, c, keep,
                                        train=False)

            model_fn = S.cfg_model_fn(apply_fn, labels, cond_scale)
            if method == "ddim":
                return S.ddim_sample(model_fn, self.schedule, x_T, seq,
                                     eta=eta, key=k_samp)
            if method == "ddpm":
                return S.ddpm_sample(model_fn, self.schedule, x_T, seq,
                                     key=k_samp)
            raise NotImplementedError(method)

        return sample

    # -- fisher ------------------------------------------------------------

    def fisher_loss_fn(self, cond_scale: float = 2.0) -> Callable:
        """Loss whose squared grads form the Fisher diagonal.

        The reference computes Fisher through the CFG *test-mode* double
        forward at cond_scale=2.0 with a sum-reduced eps-MSE
        (DDPM/runners/diffusion.py:1255-1281).
        """

        def fn(params, batch, rng):
            x, c = batch
            n = x.shape[0]
            k_t, k_noise = jax.random.split(rng)
            t = antithetic_timesteps(k_t, n, self.schedule.num_timesteps)
            noise = jax.random.normal(k_noise, x.shape, jnp.float32)

            def apply_fn(x_t, t_vec, labels, keep):
                return self.model.apply({"params": params}, x_t, t_vec,
                                        labels, keep, train=False)

            model_fn = S.cfg_model_fn(apply_fn, c, cond_scale)
            x_t = self.schedule.q_sample(x, t, noise)
            eps_hat = model_fn(x_t, t)
            return jnp.sum(jnp.square(noise - eps_hat),
                           axis=(1, 2, 3)).mean()

        return fn
