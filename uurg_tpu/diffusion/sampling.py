"""DDIM / DDPM samplers as ``lax.scan`` loops.

Reference: DDPM/functions/denoising.py (python loops that offload every
intermediate to CPU). Here the whole reverse process is one compiled scan —
no host round-trips, static timestep sequences, donated carry — and
classifier-free guidance runs as a single batched double-forward instead of
two sequential model calls (cf. DDPM/models/diffusion.py:340-355).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.diffusion.schedules import DiffusionSchedule

# model_fn(x_t, t_int_vector) -> eps prediction, conditioning closed over.
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_step_sequence(num_timesteps: int, num_steps: int,
                       kind: str = "uniform", offset: int = 0) -> np.ndarray:
    """Sub-sequence of timesteps for accelerated sampling (ascending).

    ``uniform`` matches DDPM/runners/diffusion.py skip = T // timesteps,
    seq = range(0, T, skip); ``quad`` is the quadratic spacing variant.
    ``offset=1`` reproduces the LDM convention (SD/ldm/modules/
    diffusionmodules/util.py make_ddim_timesteps adds +1 "to get the final
    alpha values right"), giving 1, 1+skip, ... instead of 0, skip, ...
    """
    if kind == "uniform":
        skip = num_timesteps // num_steps
        seq = np.arange(0, num_timesteps, skip)
    elif kind == "quad":
        seq = (np.linspace(0, np.sqrt(num_timesteps * 0.8), num_steps) ** 2)
        seq = seq.astype(int)
    else:
        raise NotImplementedError(kind)
    return seq + offset


def _seq_pairs(seq: Sequence[int]) -> tuple[np.ndarray, np.ndarray]:
    """(t, t_next) pairs in sampling (descending) order, t_next[-1] = -1."""
    seq = np.asarray(seq, dtype=np.int32)
    seq_next = np.concatenate([[-1], seq[:-1]]).astype(np.int32)
    return seq[::-1].copy(), seq_next[::-1].copy()


def ddim_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    seq: Sequence[int],
    *,
    eta: float = 0.0,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Generalized (DDIM) sampling, eta in [0, 1].

    Parity target: DDPM/functions/denoising.py:10-33 / 72-95.
    """
    ts, ts_next = _seq_pairs(seq)
    if eta != 0.0 and key is None:
        raise ValueError("eta > 0 requires a PRNG key")
    key = key if key is not None else jax.random.key(0)
    n = x_init.shape[0]
    bshape = (-1,) + (1,) * (x_init.ndim - 1)

    def body(x, step_in):
        t_scalar, t_next_scalar, k = step_in
        t_vec = jnp.full((n,), t_scalar, jnp.int32)
        at = schedule.alpha_bar_padded(t_scalar).reshape(bshape)
        at_next = schedule.alpha_bar_padded(t_next_scalar).reshape(bshape)
        et = model_fn(x, t_vec)
        x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        c1 = eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = jnp.sqrt((1.0 - at_next) - c1**2)
        noise = jax.random.normal(k, x.shape, x.dtype) if eta != 0.0 else 0.0
        x_next = jnp.sqrt(at_next) * x0_t + c1 * noise + c2 * et
        return x_next, None

    keys = jax.random.split(key, len(ts))
    x, _ = jax.lax.scan(body, x_init, (jnp.asarray(ts), jnp.asarray(ts_next), keys))
    return x


def ddim_sample_till(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    seq: Sequence[int],
    till: jnp.ndarray | int,
    *,
    eta: float = 0.0,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Partial DDIM denoise: run from the top of ``seq`` down and stop after
    the step at DDIM index ``till - 1`` (``till`` may be a traced scalar),
    leaving the latent at roughly the noise level of timestep
    ``seq[till - 1]``.  ``till == 0`` runs the full chain.

    Parity: SD/ldm/models/diffusion/ddim.py:241-281 (the ``till_T`` early
    break: steps at indices total-1 .. till-1 are executed), the primitive
    behind train-esd.py ``quick_sample_till_t``.  The loop is a
    ``lax.fori_loop`` with a dynamic trip count, so the compute matches the
    reference's variable-length python loop instead of a fixed full-length
    scan.
    """
    ts, ts_next = _seq_pairs(seq)
    ts = jnp.asarray(ts)
    ts_next = jnp.asarray(ts_next)
    total = ts.shape[0]
    till = jnp.asarray(till, jnp.int32)
    n_run = jnp.where(till > 0, total - till + 1, total)
    n = x_init.shape[0]
    bshape = (-1,) + (1,) * (x_init.ndim - 1)
    key = key if key is not None else jax.random.key(0)

    def body(i, x):
        t_scalar, t_next_scalar = ts[i], ts_next[i]
        t_vec = jnp.full((n,), t_scalar, jnp.int32)
        at = schedule.alpha_bar_padded(t_scalar).reshape(bshape)
        at_next = schedule.alpha_bar_padded(t_next_scalar).reshape(bshape)
        et = model_fn(x, t_vec)
        x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        c1 = eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = jnp.sqrt((1.0 - at_next) - c1**2)
        noise = (
            jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            if eta != 0.0 else 0.0
        )
        return jnp.sqrt(at_next) * x0_t + c1 * noise + c2 * et

    return jax.lax.fori_loop(0, n_run, body, x_init)


def ddpm_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    seq: Sequence[int],
    *,
    key: jax.Array,
) -> jnp.ndarray:
    """Ancestral sampling with x0-clamping.

    Parity target: DDPM/functions/denoising.py:36-69 / 98-131 (beta_t derived
    from the respaced alpha ratio, fixedlarge logvar, no noise at t == 0).
    """
    ts, ts_next = _seq_pairs(seq)
    n = x_init.shape[0]
    bshape = (-1,) + (1,) * (x_init.ndim - 1)

    def body(x, step_in):
        t_scalar, t_next_scalar, k = step_in
        t_vec = jnp.full((n,), t_scalar, jnp.int32)
        at = schedule.alpha_bar_padded(t_scalar).reshape(bshape)
        atm1 = schedule.alpha_bar_padded(t_next_scalar).reshape(bshape)
        beta_t = 1.0 - at / atm1
        e = model_fn(x, t_vec)
        x0 = jnp.sqrt(1.0 / at) * x - jnp.sqrt(1.0 / at - 1.0) * e
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            jnp.sqrt(atm1) * beta_t * x0
            + jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * x
        ) / (1.0 - at)
        noise = jax.random.normal(k, x.shape, x.dtype)
        nonzero = (t_scalar > 0).astype(x.dtype)
        sample = mean + nonzero * jnp.exp(0.5 * jnp.log(beta_t)) * noise
        return sample, None

    keys = jax.random.split(key, len(ts))
    x, _ = jax.lax.scan(body, x_init, (jnp.asarray(ts), jnp.asarray(ts_next), keys))
    return x


def plms_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    seq: Sequence[int],
) -> jnp.ndarray:
    """PLMS (pseudo linear multistep) sampling — deterministic, 4th-order
    Adams-Bashforth over eps predictions once warmed up.

    Parity: SD/ldm/models/diffusion/plms.py (p_sample_plms): the first step
    runs a pseudo-improved-Euler (second model call at t_next, averaged);
    steps 1/2/3+ use the AB2/AB3/AB4 combinations of the last eps values.
    TPU shape: warmup step unrolled, remainder one ``lax.scan`` whose carry
    holds (x, last-3 eps ring); the AB order is a ``lax.switch`` on a static
    per-step array — no python control flow inside the compiled loop.
    """
    ts, ts_next = _seq_pairs(seq)
    n = x_init.shape[0]
    bshape = (-1,) + (1,) * (x_init.ndim - 1)

    def alphas(i_t, i_tn):
        at = schedule.alpha_bar_padded(i_t).reshape(bshape)
        at_next = schedule.alpha_bar_padded(i_tn).reshape(bshape)
        return at, at_next

    def x_prev(x, e, at, at_next):
        x0_t = (x - e * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        return jnp.sqrt(at_next) * x0_t + jnp.sqrt(1.0 - at_next) * e

    # -- warmup (plms.py first iteration: 2 model calls) -------------------
    t0 = jnp.full((n,), ts[0], jnp.int32)
    t1 = jnp.full((n,), jnp.maximum(ts_next[0], 0), jnp.int32)
    at, at_next = alphas(ts[0], ts_next[0])
    e_t = model_fn(x_init, t0)
    x_mid = x_prev(x_init, e_t, at, at_next)
    e_next = model_fn(x_mid, t1)
    x = x_prev(x_init, (e_t + e_next) / 2.0, at, at_next)
    eps_hist = jnp.stack([e_t, e_t, e_t])  # [most recent, older, oldest]

    if len(ts) == 1:
        return x

    orders = jnp.minimum(jnp.arange(1, len(ts)), 3)

    def body(carry, step_in):
        x, hist = carry
        t_scalar, t_next_scalar, order = step_in
        at, at_next = alphas(t_scalar, t_next_scalar)
        e_t = model_fn(x, jnp.full((n,), t_scalar, jnp.int32))
        e_prime = jax.lax.switch(
            order - 1,
            [
                lambda e, h: (3.0 * e - h[0]) / 2.0,
                lambda e, h: (23.0 * e - 16.0 * h[0] + 5.0 * h[1]) / 12.0,
                lambda e, h: (55.0 * e - 59.0 * h[0] + 37.0 * h[1]
                              - 9.0 * h[2]) / 24.0,
            ],
            e_t, hist)
        x = x_prev(x, e_prime, at, at_next)
        hist = jnp.stack([e_t, hist[0], hist[1]])
        return (x, hist), None

    (x, _), _ = jax.lax.scan(
        body, (x, eps_hist),
        (jnp.asarray(ts[1:]), jnp.asarray(ts_next[1:]), orders))
    return x


def lms_coefficients(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """Integrated Lagrange-basis coefficients for sigma-space linear
    multistep (LMS) sampling.

    Parity: the diffusers ``LMSDiscreteScheduler.get_lms_coefficient`` used
    by the reference image-gen evaluator (SD/eval-scripts/
    generate-images.py:86-91).  ``sigmas`` holds the N descending noise
    levels plus the trailing 0 (N+1 entries).  Returns an (N, order) array:
    row i weights the most recent ``min(i+1, order)`` eps-derivatives
    (column 0 = newest); unused columns are zero, so the compiled scan body
    is one static dot against the history ring — the warmup order ramp
    costs no control flow.  The degree-<=3 Lagrange basis polynomials are
    integrated ANALYTICALLY (np.poly/np.polyint) instead of the reference's
    adaptive quadrature (epsrel=1e-4) — exact where diffusers approximates.
    """
    sigmas = np.asarray(sigmas, np.float64)
    n = len(sigmas) - 1
    out = np.zeros((n, order), np.float64)
    for i in range(n):
        cur = min(i + 1, order)
        for j in range(cur):
            roots = [sigmas[i - k] for k in range(cur) if k != j]
            denom = float(np.prod([sigmas[i - j] - r for r in roots]))
            # monic numerator polynomial, integrated analytically
            # (atleast_1d: np.poly([]) is a 0-d scalar at order 1)
            anti = np.polyint(np.atleast_1d(np.poly(roots)))
            out[i, j] = (np.polyval(anti, sigmas[i + 1])
                         - np.polyval(anti, sigmas[i])) / (denom or 1.0)
    return out


def lms_sample(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    x_init: jnp.ndarray,
    num_steps: int,
    *,
    order: int = 4,
) -> jnp.ndarray:
    """LMS (linear multistep) sampling in sigma space — the diffusers
    ``LMSDiscreteScheduler`` protocol the reference's generation evaluator
    runs (SD/eval-scripts/generate-images.py:86-91,150-180).

    Protocol notes, matched one-for-one:
    - timesteps are the FLOAT grid ``linspace(T-1, 0, num_steps)`` with
      sigmas ``sqrt((1-abar)/abar)`` linearly interpolated between training
      levels, plus a trailing 0 (``set_timesteps``);
    - ``x_init`` is UNIT Gaussian noise; the ``init_noise_sigma``
      (= sigma_max) scaling happens here;
    - the model input is pre-scaled by ``1/sqrt(sigma^2+1)``
      (``scale_model_input``) and ``model_fn`` receives float timesteps
      (the sinusoidal embedding interpolates smoothly);
    - each step adds the dot of the precomputed row of
      :func:`lms_coefficients` with the eps-derivative history
      (``scheduler.step``).

    The final sigma is 0, so the return value is the predicted x0 in VP
    space — decodable exactly like ``ddim``/``plms`` output.  The whole
    reverse process is one ``lax.scan`` with a (order, *x.shape) history
    ring in the carry; coefficients are host-side constants.
    """
    ab = np.asarray(schedule.alphas_cumprod, np.float64)
    full_sigmas = np.sqrt((1.0 - ab) / ab)
    T = len(ab)
    timesteps = np.linspace(T - 1, 0, num_steps, dtype=np.float64)
    sigmas = np.concatenate(
        [np.interp(timesteps, np.arange(T), full_sigmas), [0.0]])
    coeffs = lms_coefficients(sigmas, order)

    n = x_init.shape[0]
    x = x_init * sigmas[0]
    hist0 = jnp.zeros((order,) + x_init.shape, x_init.dtype)

    def body(carry, step_in):
        x, hist = carry
        t_f, sigma, c = step_in
        t_vec = jnp.full((n,), t_f, jnp.float32)
        eps = model_fn(x / jnp.sqrt(sigma * sigma + 1.0), t_vec)
        # derivative wrt sigma; for eps-prediction this IS eps, but route
        # through x0 like the reference to match its fp rounding
        x0 = x - sigma * eps
        d = (x - x0) / sigma
        hist = jnp.concatenate([d[None], hist[:-1]])
        return (x + jnp.tensordot(c, hist, axes=1), hist), None

    (x, _), _ = jax.lax.scan(
        body, (x, hist0),
        (jnp.asarray(timesteps, jnp.float32),
         jnp.asarray(sigmas[:-1], jnp.float32),
         jnp.asarray(coeffs, jnp.float32)))
    return x


def cfg_model_fn(
    apply_fn: Callable[..., jnp.ndarray],
    labels: jnp.ndarray,
    cond_scale: float,
) -> ModelFn:
    """Classifier-free guidance as ONE batched double-forward.

    ``apply_fn(x, t, c, cond_keep)`` must honor a boolean per-sample
    keep-mask selecting the null class embedding when False. Output is
    ``(1 + s) * cond - s * uncond`` (DDPM/models/diffusion.py:340-355).
    """
    def fn(x, t):
        if cond_scale == 0.0:
            keep = jnp.ones_like(labels, dtype=bool)
            return apply_fn(x, t, labels, keep)
        n = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jnp.concatenate([labels, labels], axis=0)
        keep = jnp.concatenate(
            [jnp.ones((n,), bool), jnp.zeros((n,), bool)], axis=0
        )
        out = apply_fn(x2, t2, c2, keep)
        cond, uncond = out[:n], out[n:]
        return (1.0 + cond_scale) * cond - cond_scale * uncond

    return fn
