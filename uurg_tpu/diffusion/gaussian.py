"""ADM-style Gaussian diffusion with learned variance (for DiT).

Functional JAX re-design of the vendored ADM library the reference ships
(DiT/diffusion/gaussian_diffusion.py:144-873, respace.py:12-129): eps-mean
parameterization, LEARNED_RANGE variance, hybrid MSE+VB training loss with
the frozen-mean trick, ancestral + DDIM sampling as ``lax.scan`` loops, and
timestep respacing with the rescaled-t map.

Everything is shape-static and key-threaded; the model function signature is
``model_fn(x, t, **kwargs) -> (B, H, W, 2C)`` (eps | raw variance) for
learned-sigma models, or ``(B, H, W, C)`` for fixed variance.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(T: int, scale_ref: int = 1000,
                         max_beta: float = 0.999) -> np.ndarray:
    """ADM linear schedule scaled for any T (gaussian_diffusion.py parity).

    Clipped to ``max_beta``: the ADM scaling assumes T is near 1000 and
    produces betas > 1 for very short test schedules.
    """
    scale = scale_ref / T
    betas = np.linspace(scale * 1e-4, scale * 2e-2, T, dtype=np.float64)
    return np.clip(betas, 0.0, max_beta)


def cosine_beta_schedule(T: int, max_beta: float = 0.999) -> np.ndarray:
    f = lambda t: np.cos((t / T + 0.008) / 1.008 * np.pi / 2) ** 2
    t = np.arange(T)
    return np.clip(1 - f(t + 1) / f(t), 0, max_beta)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) elementwise (DiT/diffusion/diffusion_utils.py parity)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(
        jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3))))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of 8-bit-discretized data under N(means, exp(2*ls))."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Precomputed constants; arrays are float64 numpy, gathered per-t."""

    betas: np.ndarray
    learn_sigma: bool = True
    # respacing: map from positions in this (possibly shortened) schedule to
    # original-model timesteps (identity when not respaced)
    timestep_map: np.ndarray | None = None
    rescale_timesteps: bool = False
    original_num_steps: int | None = None

    def __post_init__(self):
        betas = np.asarray(self.betas, np.float64)
        object.__setattr__(self, "betas", betas)
        T = len(betas)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        c = {}
        c["alphas_cumprod"] = acp
        c["alphas_cumprod_prev"] = acp_prev
        c["sqrt_alphas_cumprod"] = np.sqrt(acp)
        c["sqrt_one_minus_alphas_cumprod"] = np.sqrt(1 - acp)
        c["sqrt_recip_alphas_cumprod"] = np.sqrt(1.0 / acp)
        c["sqrt_recipm1_alphas_cumprod"] = np.sqrt(1.0 / acp - 1)
        pv = betas * (1.0 - acp_prev) / (1.0 - acp)
        c["posterior_variance"] = pv
        c["posterior_log_variance_clipped"] = np.log(
            np.append(pv[1], pv[1:])) if T > 1 else np.log(pv)
        c["posterior_mean_coef1"] = betas * np.sqrt(acp_prev) / (1.0 - acp)
        c["posterior_mean_coef2"] = ((1.0 - acp_prev) * np.sqrt(alphas)
                                     / (1.0 - acp))
        c["log_betas"] = np.log(np.maximum(betas, 1e-20))
        object.__setattr__(self, "_c", {
            k: jnp.asarray(v, jnp.float32) for k, v in c.items()})
        if self.timestep_map is None:
            object.__setattr__(self, "timestep_map", np.arange(T))
        if self.original_num_steps is None:
            object.__setattr__(self, "original_num_steps", T)

    # -- helpers -----------------------------------------------------------

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def _g(self, name: str, t, shape):
        """Gather constant ``name`` at t, broadcast to batch shape."""
        v = self._c[name][t]
        return v.reshape((-1,) + (1,) * (len(shape) - 1))

    def _model_t(self, t):
        """Map respaced t -> original-model t (SpacedDiffusion semantics)."""
        mt = jnp.asarray(self.timestep_map)[t]
        if self.rescale_timesteps:
            mt = mt.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return mt

    def q_sample(self, x0, t, noise):
        return (self._g("sqrt_alphas_cumprod", t, x0.shape) * x0
                + self._g("sqrt_one_minus_alphas_cumprod", t, x0.shape) * noise)

    def q_posterior(self, x0, x_t, t):
        mean = (self._g("posterior_mean_coef1", t, x_t.shape) * x0
                + self._g("posterior_mean_coef2", t, x_t.shape) * x_t)
        var = self._g("posterior_variance", t, x_t.shape)
        logvar = self._g("posterior_log_variance_clipped", t, x_t.shape)
        return mean, var, logvar

    def predict_x0_from_eps(self, x_t, t, eps):
        return (self._g("sqrt_recip_alphas_cumprod", t, x_t.shape) * x_t
                - self._g("sqrt_recipm1_alphas_cumprod", t, x_t.shape) * eps)

    def _split_model_out(self, out, x_t):
        C = x_t.shape[-1]
        if self.learn_sigma:
            assert out.shape[-1] == 2 * C, (out.shape, C)
            return out[..., :C], out[..., C:]
        return out, None

    def _model_logvar(self, var_raw, t, shape):
        """LEARNED_RANGE: v in [-1,1] interpolates [posterior_log, log_beta]."""
        min_log = self._g("posterior_log_variance_clipped", t, shape)
        max_log = self._g("log_betas", t, shape)
        frac = (var_raw + 1.0) / 2.0
        return frac * max_log + (1.0 - frac) * min_log

    def p_mean_variance(self, model_fn, x_t, t, clip_denoised=True, **kwargs):
        out = model_fn(x_t, self._model_t(t), **kwargs)
        eps, var_raw = self._split_model_out(out, x_t)
        if self.learn_sigma:
            logvar = self._model_logvar(var_raw, t, x_t.shape)
        else:
            logvar = self._g("posterior_log_variance_clipped", t, x_t.shape)
        x0 = self.predict_x0_from_eps(x_t, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, _, _ = self.q_posterior(x0, x_t, t)
        return mean, logvar, x0, eps

    # -- training losses ---------------------------------------------------

    def vb_term(self, model_fn, x0, x_t, t, **kwargs):
        """L_t = KL(q(x_{t-1}|x_t,x0) || p(x_{t-1}|x_t)) in bits/dim, with
        the decoder NLL at t == 0 (gaussian_diffusion.py _vb_terms_bpd)."""
        true_mean, _, true_logvar = self.q_posterior(x0, x_t, t)
        mean, logvar, _, _ = self.p_mean_variance(
            model_fn, x_t, t, clip_denoised=False, **kwargs)
        kl = normal_kl(true_mean, true_logvar, mean, logvar)
        kl = kl.mean(axis=tuple(range(1, kl.ndim))) / np.log(2.0)
        nll = -discretized_gaussian_log_likelihood(x0, mean, 0.5 * logvar)
        nll = nll.mean(axis=tuple(range(1, nll.ndim))) / np.log(2.0)
        return jnp.where(t == 0, nll, kl)

    def training_losses(self, model_fn, x0, t, key, keepdim=False, **kwargs):
        """Hybrid loss: per-sample mean eps-MSE + VB (frozen-mean trick:
        the VB gradient only trains the variance head — eps is
        stop-gradiented inside the VB model call)."""
        noise = jax.random.normal(key, x0.shape, x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        out = model_fn(x_t, self._model_t(t), **kwargs)
        eps, var_raw = self._split_model_out(out, x_t)
        mse = jnp.mean(jnp.square(noise - eps),
                       axis=tuple(range(1, x0.ndim)))
        total = mse
        if self.learn_sigma:
            def frozen_model(x_in, t_in, **kw):
                return jnp.concatenate(
                    [jax.lax.stop_gradient(eps), var_raw], axis=-1)

            vb = self.vb_term(frozen_model, x0, x_t, t, **kwargs)
            # ADM scales VB by T/1000 when respacing rescales steps
            total = mse + vb
        return total if keepdim else total.mean()

    # -- sampling ----------------------------------------------------------

    def p_sample_loop(self, model_fn, shape, key, clip_denoised=True,
                      **kwargs):
        """Ancestral sampling over all respaced steps as one lax.scan."""
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, shape, jnp.float32)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(x, inp):
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            mean, logvar, _, _ = self.p_mean_variance(
                model_fn, x, t, clip_denoised, **kwargs)
            noise = jax.random.normal(k, x.shape, x.dtype)
            nonzero = (t_scalar > 0).astype(x.dtype)
            return mean + nonzero * jnp.exp(0.5 * logvar) * noise, None

        keys = jax.random.split(k_loop, self.num_timesteps)
        x, _ = jax.lax.scan(body, x, (ts, keys))
        return x

    def ddim_sample_loop(self, model_fn, shape, key, eta=0.0,
                         clip_denoised=True, **kwargs):
        k_init, k_loop = jax.random.split(key)
        x = jax.random.normal(k_init, shape, jnp.float32)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(x, inp):
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            _, _, x0, eps = self.p_mean_variance(
                model_fn, x, t, clip_denoised, **kwargs)
            abar = self._g("alphas_cumprod", t, x.shape)
            abar_prev = self._g("alphas_cumprod_prev", t, x.shape)
            sigma = (eta * jnp.sqrt((1 - abar_prev) / (1 - abar))
                     * jnp.sqrt(1 - abar / abar_prev))
            mean = (jnp.sqrt(abar_prev) * x0
                    + jnp.sqrt(1 - abar_prev - sigma**2) * eps)
            noise = jax.random.normal(k, x.shape, x.dtype)
            nonzero = (t_scalar > 0).astype(x.dtype)
            return mean + nonzero * sigma * noise, None

        keys = jax.random.split(k_loop, self.num_timesteps)
        x, _ = jax.lax.scan(body, x, (ts, keys))
        return x


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """ADM respacing spec parser (DiT/diffusion/respace.py:12-63): either
    "ddimN", a comma list of per-section counts, or an int N."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = ([int(x) for x in section_counts.split(",")]
                          if section_counts else [num_timesteps])
    elif isinstance(section_counts, int):
        section_counts = [section_counts]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur, taken = 0.0, []
        for _ in range(count):
            taken.append(start + round(cur))
            cur += stride
        all_steps += taken
        start += size
    return all_steps


def make_diffusion(timestep_respacing: str | int = "",
                   num_timesteps: int = 1000,
                   learn_sigma: bool = True,
                   schedule: str = "linear") -> GaussianDiffusion:
    """DiT create_diffusion equivalent (DiT/diffusion/__init__.py:10-46)."""
    betas = (linear_beta_schedule(num_timesteps) if schedule == "linear"
             else cosine_beta_schedule(num_timesteps))
    if timestep_respacing in ("", None):
        return GaussianDiffusion(betas=betas, learn_sigma=learn_sigma)
    use = sorted(space_timesteps(num_timesteps, timestep_respacing))
    last_abar = 1.0
    acp = np.cumprod(1.0 - betas)
    new_betas = []
    for i in use:
        new_betas.append(1 - acp[i] / last_abar)
        last_abar = acp[i]
    return GaussianDiffusion(
        betas=np.asarray(new_betas), learn_sigma=learn_sigma,
        timestep_map=np.asarray(use), original_num_steps=num_timesteps)
