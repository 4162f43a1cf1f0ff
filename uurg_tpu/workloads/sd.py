"""Stable-Diffusion workload: latent diffusion + concept-erasure methods.

Covers the live surface of the reference's SD directory (SURVEY.md 2.4):
LatentDiffusion training semantics (SD/ldm/models/diffusion/ddpm.py —
``get_input`` VAE-encode + text cond, ``q_sample``, ``apply_model``,
``shared_step``/``p_losses``) and the five train-scripts:

- nsfw_removal (SFR-on two-phase: forget = MSE(eps(nude), sg(eps(clothed))),
  remain = shared_step on clothed images) — nsfw_removal.py:108-203
- ESD (negative-guidance target from the frozen base model) — train-esd.py
- random_label / certain_label — random_label.py
- gradient_ascent — gradient_ascent.py
- proximal_gradient (L1-prox shrink toward init) — proximal_gradient.py

TPU-native differences: the frozen twin model the reference parks on a
second GPU is just a second (stop-gradient) apply of the same params inside
ONE jitted step; the prox threshold top-k runs as a device-side sort, not a
second-GPU copy.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from uurg_tpu.diffusion.schedules import DiffusionSchedule, make_schedule
from uurg_tpu.models.autoencoder_kl import AutoencoderKL, VAEConfig
from uurg_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder, tokenize
from uurg_tpu.models.sd_unet import SDUNet, SDUNetConfig


@dataclasses.dataclass
class SDWorkload:
    """LatentDiffusion bundle: UNet + frozen VAE + frozen text encoder."""

    unet: SDUNet
    vae: AutoencoderKL
    text: CLIPTextEncoder
    schedule: DiffusionSchedule
    vae_params: Any = None
    text_params: Any = None

    @classmethod
    def build(cls, unet_cfg: SDUNetConfig | None = None,
              vae_cfg: VAEConfig | None = None,
              text_cfg: CLIPTextConfig | None = None) -> "SDWorkload":
        # LDM v1 schedule: linear-sqrt betas 0.00085..0.012, T=1000
        return cls(
            unet=SDUNet(unet_cfg or SDUNetConfig()),
            vae=AutoencoderKL(vae_cfg or VAEConfig()),
            text=CLIPTextEncoder(text_cfg or CLIPTextConfig()),
            schedule=make_schedule("quad", 0.00085, 0.012, 1000),
        )

    # -- LatentDiffusion semantics ----------------------------------------

    def get_learned_conditioning(self, prompts) -> jnp.ndarray:
        """Prompt strings -> CLIP hidden states (ddpm.py
        get_learned_conditioning parity)."""
        ids = jnp.asarray(tokenize(prompts, self.text.cfg.max_length))
        return self.text.apply({"params": self.text_params}, ids)

    def get_input(self, images: jnp.ndarray, prompts, key) -> tuple:
        """(z latents, context) — VAE-encode [-1,1] images + embed text
        (ddpm.py:913-974)."""
        z = self.vae.apply({"params": self.vae_params}, images, key,
                           method=AutoencoderKL.encode)
        return z, self.get_learned_conditioning(prompts)

    def apply_model(self, params, z_noisy, t, context) -> jnp.ndarray:
        return self.unet.apply({"params": params}, z_noisy, t, context)

    def p_losses(self, params, z, context, t, noise) -> jnp.ndarray:
        """eps-MSE (mean) — ddpm.py:1286-1320 with parameterization=eps."""
        z_noisy = self.schedule.q_sample(z, t, noise)
        eps_hat = self.apply_model(params, z_noisy, t, context)
        return jnp.mean(jnp.square(noise - eps_hat))

    def shared_step_loss(self, params, batch, rng) -> jnp.ndarray:
        """batch = (z latents, context): sample t + noise, eps loss."""
        z, context = batch
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (z.shape[0],), 0,
                               self.schedule.num_timesteps)
        noise = jax.random.normal(k_n, z.shape, z.dtype)
        return self.p_losses(params, z, context, t, noise)

    # -- method losses (operate on pre-encoded batches) --------------------

    def nsfw_forget_loss_fn(self) -> Callable:
        """forget batch = (z_nude, ctx_nude, ctx_clothed):
        MSE(eps(z_t, nude ctx), stop_grad(eps(z_t, clothed ctx)))
        (nsfw_removal.py:144-153)."""

        def fn(params, batch, rng):
            z, ctx_forget, ctx_pseudo = batch
            k_t, k_n = jax.random.split(rng)
            t = jax.random.randint(k_t, (z.shape[0],), 0,
                                   self.schedule.num_timesteps)
            noise = jax.random.normal(k_n, z.shape, z.dtype)
            z_t = self.schedule.q_sample(z, t, noise)
            out = self.apply_model(params, z_t, t, ctx_forget)
            target = jax.lax.stop_gradient(
                self.apply_model(params, z_t, t, ctx_pseudo))
            return jnp.mean(jnp.square(out - target))

        return fn

    def esd_loss_fn(self, negative_guidance: float = 1.0) -> Callable:
        """ESD: push eps toward e_0 - eta * (e_p - e_0) computed by the
        FROZEN base model (train-esd.py:291-329). batch = (z_t partially
        denoised latents, t, ctx_concept, ctx_empty); the frozen params
        arrive as the 4th argument (jit arg, not a closure constant)."""

        def fn(params, batch, rng, frozen_params):
            z_t, t, ctx_c, ctx_0 = batch
            e0 = jax.lax.stop_gradient(
                self.apply_model(frozen_params, z_t, t, ctx_0))
            ep = jax.lax.stop_gradient(
                self.apply_model(frozen_params, z_t, t, ctx_c))
            target = e0 - negative_guidance * (ep - e0)
            out = self.apply_model(params, z_t, t, ctx_c)
            return jnp.mean(jnp.square(out - target))

        return fn

    def ga_loss_fn(self, remain_alpha: float = 1.0) -> Callable:
        """-shared_step(forget) + alpha * shared_step(remain)
        (gradient_ascent.py:14-123). batch = (forget_batch, remain_batch)."""

        def fn(params, batch, rng):
            fb, rb = batch
            k1, k2 = jax.random.split(rng)
            return (-self.shared_step_loss(params, fb, k1)
                    + remain_alpha * self.shared_step_loss(params, rb, k2))

        return fn

    def rl_forget_loss_fn(self) -> Callable:
        """certain_label: match forget-prompt output to pseudo-class target
        noise prediction (random_label.py:13-155). Same computation shape as
        nsfw forget."""
        return self.nsfw_forget_loss_fn()

    # -- sampling ----------------------------------------------------------

    def make_sampler(self, *, num_steps: int = 50, guidance_scale: float = 7.5,
                     latent_size: int = 64, eta: float = 0.0,
                     method: str = "ddim"):
        """Text-conditional CFG sampler -> latents (decode via VAE).

        Parity: SD/ldm/models/diffusion/ddim.py (``method='ddim'``),
        plms.py (``method='plms'``, deterministic — ``eta`` ignored), and
        the diffusers LMSDiscreteScheduler pipeline the reference's
        generation evaluator assembles (``method='lms'`` —
        SD/eval-scripts/generate-images.py:86-91,150-180; sigma-space
        multistep over float timesteps, model input pre-scaled by
        1/sqrt(sigma^2+1)); CFG is eps_0 + g*(eps_c - eps_0) via one
        batched double-forward in every mode.
        """
        from uurg_tpu.diffusion import sampling as S

        # offset=1: LDM's make_ddim_timesteps samples at 1, 1+skip, ...
        # (SD/ldm/modules/diffusionmodules/util.py) — without it the final
        # alpha is off by one step vs the reference pipeline
        seq = S.make_step_sequence(self.schedule.num_timesteps, num_steps,
                                   offset=1)
        # the empty-prompt context is computed EAGERLY here: calling the
        # frozen text encoder inside the jitted sampler would bake its
        # ~123M params into the HLO as constants (the compile-relay 413
        # failure mode); a (1, 77, d) array constant is harmless
        uncond_1 = jnp.asarray(self.get_learned_conditioning([""]))

        def sample(params, context, key):
            n = context.shape[0]
            k_init, k_s = jax.random.split(key)
            ctx_uncond = jnp.broadcast_to(uncond_1, context.shape)

            def model_fn(x, t):
                x2 = jnp.concatenate([x, x])
                t2 = jnp.concatenate([t, t])
                c2 = jnp.concatenate([context, ctx_uncond])
                out = self.apply_model(params, x2, t2, c2)
                cond, uncond = out[:n], out[n:]
                return uncond + guidance_scale * (cond - uncond)

            x_T = jax.random.normal(
                k_init, (n, latent_size, latent_size, 4), jnp.float32)
            if method == "plms":
                return S.plms_sample(model_fn, self.schedule, x_T, seq)
            if method == "lms":
                # lms scales x_T by init_noise_sigma itself and feeds the
                # model float timesteps on its own interpolated grid (seq
                # unused — the diffusers protocol has no +1 offset)
                return S.lms_sample(model_fn, self.schedule, x_T, num_steps)
            return S.ddim_sample(model_fn, self.schedule, x_T, seq, eta=eta,
                                 key=k_s)

        return sample

    def make_quick_sampler(self, *, ddim_steps: int = 50,
                           start_guidance: float = 3.0):
        """``quick_sample_till_t`` (train-esd.py:40-77,240-253): CFG DDIM
        partial denoise with the CURRENT params, stopping at dynamic DDIM
        index ``till``.  Returns ``sample(params, ctx, ctx_uncond, x_T,
        till)`` — ``ctx``/``ctx_uncond`` batch-shaped contexts; CFG is one
        batched double-forward at ``start_guidance`` (the reference's
        ``scale`` in sample_model)."""
        from uurg_tpu.diffusion import sampling as S

        seq = S.make_step_sequence(self.schedule.num_timesteps, ddim_steps,
                                   offset=1)

        def sample(params, ctx, ctx_uncond, x_T, till):
            n = x_T.shape[0]

            def model_fn(x, t):
                x2 = jnp.concatenate([x, x])
                t2 = jnp.concatenate([t, t])
                c2 = jnp.concatenate([ctx, ctx_uncond])
                out = self.apply_model(params, x2, t2, c2)
                cond, uncond = out[:n], out[n:]
                return uncond + start_guidance * (cond - uncond)

            return S.ddim_sample_till(model_fn, self.schedule, x_T, seq,
                                      till)

        return sample

    # -- proximal gradient -------------------------------------------------

    def make_prox_operator(self, init_params, top_ratio: float = 0.01):
        """Soft-threshold shrink toward init params; threshold = top-k |delta|
        quantile per step (proximal_gradient.py:140-183), computed on device
        instead of a second GPU."""

        @jax.jit
        def _prox(params, init_params):
            leaves, treedef = jax.tree_util.tree_flatten(
                jax.tree_util.tree_map(jnp.subtract, params, init_params))
            flat = jnp.concatenate([jnp.abs(l).ravel() for l in leaves])
            k = max(1, int(flat.size * top_ratio))
            thresh = jnp.sort(flat)[-k]

            def shrink(delta):
                mag = jnp.maximum(jnp.abs(delta) - thresh, 0.0)
                return jnp.sign(delta) * mag

            deltas = jax.tree_util.tree_unflatten(
                treedef, [shrink(l) for l in leaves])
            return jax.tree_util.tree_map(jnp.add, init_params, deltas)

        # init params bound as a jit argument, not a closure constant
        return lambda params: _prox(params, init_params)

    # -- fisher ------------------------------------------------------------

    def fisher_loss_fn(self, guidance: float = 3.0) -> Callable:
        """CFG-composed eps, loss = -MSE(noise, eps) whose squared grads form
        the Fisher (generate_fisher.py:8-129). batch = (z, ctx, ctx_empty)."""

        def fn(params, batch, rng):
            z, ctx, ctx0 = batch
            k_t, k_n = jax.random.split(rng)
            t = jax.random.randint(k_t, (z.shape[0],), 0,
                                   self.schedule.num_timesteps)
            noise = jax.random.normal(k_n, z.shape, z.dtype)
            z_t = self.schedule.q_sample(z, t, noise)
            e_c = self.apply_model(params, z_t, t, ctx)
            e_0 = self.apply_model(params, z_t, t, ctx0)
            eps = (1 + guidance) * e_c - guidance * e_0
            return -jnp.mean(jnp.square(noise - eps))

        return fn
