"""DiT workload: latent-space class forgetting on ImageNet
(reference: DiT/forget.py, DiT/generate_fisher.py, DiT/generate_mask.py).

Latents arrive already VAE-encoded and scaled by 0.18215 (the reference
encodes each batch through a frozen AutoencoderKL — DiT/forget.py:265-267;
our pipeline pre-encodes or uses ``uurg_tpu.models.vae``).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from uurg_tpu.diffusion.gaussian import GaussianDiffusion, make_diffusion
from uurg_tpu.diffusion.losses import adaptive_loss
from uurg_tpu.models.dit import DiT, DiTConfig, build_dit, init_dit

VAE_SCALE = 0.18215


@dataclasses.dataclass
class DiTWorkload:
    model: DiT
    cfg: DiTConfig
    diffusion: GaussianDiffusion
    lambd: float = 0.5
    # optional forward override, signature (params, x, t, y, cond_keep) ->
    # model output. Set by the runner for pipeline parallelism
    # (parallel/pipeline.py dit_apply_pipelined); None = plain module apply.
    apply_fn: Callable | None = None

    @classmethod
    def build(cls, name: str = "DiT-XL/2", image_size: int = 256,
              num_classes: int = 1000, lambd: float = 0.5,
              dtype=jnp.bfloat16, **overrides) -> "DiTWorkload":
        """``overrides`` forwards to DiTConfig (e.g. remat_policy="dots")."""
        model, cfg = build_dit(name, input_size=image_size // 8,
                               num_classes=num_classes, dtype=dtype,
                               **overrides)
        return cls(model=model, cfg=cfg,
                   diffusion=make_diffusion("", 1000, learn_sigma=True),
                   lambd=lambd)

    def init_params(self, key):
        _, params = init_dit(key, self.cfg)
        return params

    def _model_fn(self, params, y, cond_keep=None, train=False, rng=None):
        def fn(x, t, **kw):
            if self.apply_fn is not None:
                return self.apply_fn(params, x, t, y, cond_keep)
            return self.model.apply({"params": params}, x, t, y, cond_keep,
                                    train=train)
        return fn

    def _per_sample_loss(self, params, batch, rng, train=True):
        x, y = batch  # x: latents (B, h, w, 4) already scaled
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (x.shape[0],), 0,
                               self.diffusion.num_timesteps)
        return self.diffusion.training_losses(
            self._model_fn(params, y, train=train), x, t, k_n, keepdim=True)

    def train_loss_fn(self) -> Callable:
        def fn(params, batch, rng):
            return self._per_sample_loss(params, batch, rng).mean()
        return fn

    def train_loss_with_sampler_fn(self, uniform_prob: float = 0.001
                                   ) -> Callable:
        """Loss-second-moment resampled training loss (the ADM library's
        loss-aware sampler, DiT/diffusion/timestep_sampler.py:120-150,
        surfaced here as a has-aux loss).

        Signature: ``fn(params, batch, rng, sampler_state) ->
        (loss, new_sampler_state)`` — the importance-weighted per-sample
        mean plus the updated jit-carried ring-buffer state.
        """
        from uurg_tpu.diffusion.timestep_sampler import (
            sample_timesteps, update_with_all_losses)

        def fn(params, batch, rng, sampler_state):
            x, y = batch
            k_t, k_n = jax.random.split(rng)
            t, w = sample_timesteps(sampler_state, k_t, x.shape[0],
                                    uniform_prob)
            per = self.diffusion.training_losses(
                self._model_fn(params, y, train=True), x, t, k_n,
                keepdim=True)
            new_state = update_with_all_losses(
                sampler_state, t, jax.lax.stop_gradient(per))
            return (w * per).mean(), new_state

        return fn

    def ga_forget_loss_fn(self) -> Callable:
        """-mean(training_losses) (DiT/forget.py:269-272)."""
        def fn(params, batch, rng):
            return -self._per_sample_loss(params, batch, rng).mean()
        return fn

    def adaga_forget_loss_fn(self) -> Callable:
        """-adaptive_loss over per-sample hybrid losses
        (DiT/forget.py:38-50, eps=1e-15)."""
        def fn(params, batch, rng):
            per = self._per_sample_loss(params, batch, rng)
            return -adaptive_loss(per, self.lambd, eps=1e-15)
        return fn

    def rl_forget_loss_fn(self, label_to_forget: int) -> Callable:
        """Random-label variant: push forget-class outputs toward a pseudo
        class's detached prediction."""
        pseudo = (label_to_forget + 1) % self.cfg.num_classes

        def fn(params, batch, rng):
            x, y = batch
            k_t, k_n = jax.random.split(rng)
            t = jax.random.randint(k_t, (x.shape[0],), 0,
                                   self.diffusion.num_timesteps)
            noise = jax.random.normal(k_n, x.shape, x.dtype)
            x_t = self.diffusion.q_sample(x, t, noise)
            out = self._model_fn(params, y)(x_t, t)
            pseudo_y = jnp.full_like(y, pseudo)
            target = jax.lax.stop_gradient(
                self._model_fn(params, pseudo_y)(x_t, t))
            return jnp.mean(jnp.square(out - target))

        return fn

    def forget_loss_fn(self, kind: str, label_to_forget: int = 0) -> Callable:
        return {"adaga": self.adaga_forget_loss_fn,
                "ga": self.ga_forget_loss_fn}.get(
            kind, lambda: self.rl_forget_loss_fn(label_to_forget))()

    def make_sampler(self, *, respacing: str = "250", cond_scale: float = 4.0,
                     cfg_channels: int | None = 3) -> Callable:
        """CFG sampler over a respaced diffusion; guidance optionally applied
        to the first ``cfg_channels`` only (DiT/models.py:250-267 quirk)."""
        diff = make_diffusion(respacing, 1000, learn_sigma=True)

        def sample(params, labels, key):
            n = labels.shape[0]
            shape = (n, self.cfg.input_size, self.cfg.input_size,
                     self.cfg.in_channels)

            def cfg_model(x, t, **kw):
                x2 = jnp.concatenate([x, x])
                t2 = jnp.concatenate([t, t])
                y2 = jnp.concatenate([labels, labels])
                keep = jnp.concatenate(
                    [jnp.ones((n,), bool), jnp.zeros((n,), bool)])
                out = self.model.apply({"params": params}, x2, t2, y2, keep)
                cond, uncond = out[:n], out[n:]
                eps_c, rest_c = cond[..., :self.cfg.in_channels], \
                    cond[..., self.cfg.in_channels:]
                eps_u = uncond[..., :self.cfg.in_channels]
                if cfg_channels is not None and cfg_channels < self.cfg.in_channels:
                    g = eps_u[..., :cfg_channels] + cond_scale * (
                        eps_c[..., :cfg_channels] - eps_u[..., :cfg_channels])
                    eps = jnp.concatenate([g, eps_c[..., cfg_channels:]], -1)
                else:
                    eps = eps_u + cond_scale * (eps_c - eps_u)
                return jnp.concatenate([eps, rest_c], axis=-1)

            return diff.p_sample_loop(cfg_model, shape, key)

        return sample
