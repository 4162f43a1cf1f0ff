"""LMS sampler tests — parity with the diffusers LMSDiscreteScheduler
protocol the reference's image-gen evaluator assembles
(SD/eval-scripts/generate-images.py:86-91,150-180)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion import make_schedule
from uurg_tpu.diffusion.sampling import lms_coefficients, lms_sample


def _sd_sigma_grid(num_steps=20, T=1000):
    """The LMSDiscreteScheduler.set_timesteps grid over the LDM v1
    (scaled-linear / 'quad') schedule: float timesteps linspace(T-1, 0, N),
    sigmas interpolated between training levels, trailing 0 appended."""
    sched = make_schedule(beta_schedule="quad", beta_start=0.00085,
                          beta_end=0.012, num_diffusion_timesteps=T)
    ab = np.asarray(sched.alphas_cumprod, np.float64)
    full = np.sqrt((1.0 - ab) / ab)
    ts = np.linspace(T - 1, 0, num_steps, dtype=np.float64)
    return np.concatenate([np.interp(ts, np.arange(T), full), [0.0]])


def test_uniform_grid_matches_adams_bashforth():
    # On an equally spaced grid the integrated Lagrange coefficients reduce
    # to the classic Adams-Bashforth weights times the step h (here h < 0:
    # sigma descends). Hand values: AB1 [1], AB2 [3/2, -1/2],
    # AB3 [23/12, -16/12, 5/12], AB4 [55/24, -59/24, 37/24, -9/24].
    h = -0.5
    sigmas = 10.0 + h * np.arange(9, dtype=np.float64)  # 10, 9.5, ... 6
    c = lms_coefficients(sigmas, order=4)
    ab_rows = {
        0: [1.0, 0, 0, 0],
        1: [3 / 2, -1 / 2, 0, 0],
        2: [23 / 12, -16 / 12, 5 / 12, 0],
        3: [55 / 24, -59 / 24, 37 / 24, -9 / 24],
        7: [55 / 24, -59 / 24, 37 / 24, -9 / 24],
    }
    for i, row in ab_rows.items():
        np.testing.assert_allclose(c[i], h * np.asarray(row),
                                   rtol=1e-12, atol=1e-12)


def test_coefficients_match_reference_quadrature():
    # Transcription of diffusers LMSDiscreteScheduler.get_lms_coefficient
    # (the reference evaluator's scheduler), which integrates the same
    # Lagrange basis with adaptive quadrature (epsrel=1e-4). Our analytic
    # integrals must agree on the real non-uniform SD sigma grid.
    from scipy import integrate

    sigmas = _sd_sigma_grid(num_steps=15)

    def ref_coeff(order, t, current_order):
        def lms_derivative(tau):
            prod = 1.0
            for k in range(order):
                if current_order == k:
                    continue
                prod *= (tau - sigmas[t - k]) / (
                    sigmas[t - current_order] - sigmas[t - k])
            return prod

        return integrate.quad(lms_derivative, sigmas[t], sigmas[t + 1],
                              epsrel=1e-4)[0]

    ours = lms_coefficients(sigmas, order=4)
    for t in range(len(sigmas) - 1):
        order = min(t + 1, 4)
        ref = [ref_coeff(order, t, co) for co in range(order)]
        np.testing.assert_allclose(ours[t, :order], ref, rtol=1e-6,
                                   atol=1e-10)
        assert not ours[t, order:].any()


def test_constant_eps_is_exact():
    # With model_fn == const c the eps-derivative is constant, so ANY-order
    # multistep integration is exact: x_final = sigma_max * noise +
    # (0 - sigma_max) * c, independent of num_steps.
    sched = make_schedule(beta_schedule="quad", beta_start=0.00085,
                          beta_end=0.012, num_diffusion_timesteps=100)
    ab = np.asarray(sched.alphas_cumprod, np.float64)
    sigma_max = float(np.sqrt((1 - ab[-1]) / ab[-1]))
    c = jax.random.normal(jax.random.key(1), (2, 4, 4, 3)) * 0.3
    noise = jax.random.normal(jax.random.key(2), (2, 4, 4, 3))
    for num_steps in (1, 3, 8):
        out = lms_sample(lambda x, t: c, sched, noise, num_steps)
        np.testing.assert_allclose(
            np.asarray(out), sigma_max * np.asarray(noise - c),
            rtol=2e-3, atol=2e-3)


def test_oracle_model_recovers_x0():
    # An eps-oracle in sigma space (eps = (x_sigma - x0)/sigma, with the
    # model seeing the VP-scaled input) yields the ODE dx/dsigma =
    # (x - x0)/sigma, whose solution x = x0 + k*sigma has a CONSTANT
    # derivative k along the trajectory — so LMS of any order/step count
    # must land on x0 to float32 rounding.
    sched = make_schedule(beta_schedule="quad", beta_start=0.00085,
                          beta_end=0.012, num_diffusion_timesteps=1000)
    ab = np.asarray(sched.alphas_cumprod, np.float64)
    full = np.sqrt((1 - ab) / ab)
    x0 = jax.random.normal(jax.random.key(3), (1, 4, 4, 2)) * 0.5
    noise = jax.random.normal(jax.random.key(4), (1, 4, 4, 2))

    def oracle(x_scaled, t_vec):
        # invert scale_model_input, then eps = (x - x0) / sigma
        sigma = jnp.interp(t_vec[0], jnp.arange(1000.0),
                           jnp.asarray(full, jnp.float32))
        x = x_scaled * jnp.sqrt(sigma * sigma + 1.0)
        return (x - x0) / sigma

    for num_steps in (5, 10, 40):
        out = lms_sample(oracle, sched, noise, num_steps)
        assert float(jnp.abs(out - x0).max()) < 1e-5


@pytest.mark.slow
def test_sd_sampler_lms_mode():
    # make_sampler(method='lms') wires the protocol end to end on a tiny
    # SD workload: unit-noise input, float timesteps, VP-space output.
    from uurg_tpu.models.autoencoder_kl import init_vae
    from uurg_tpu.models.clip_text import init_clip_text
    from uurg_tpu.models.sd_unet import init_sd_unet
    from uurg_tpu.workloads.sd import SDWorkload

    from tests.test_sd import TINY_TEXT, TINY_UNET, TINY_VAE

    wl = SDWorkload.build(TINY_UNET, TINY_VAE, TINY_TEXT)
    _, wl.vae_params = init_vae(jax.random.key(1), TINY_VAE, resolution=16)
    _, wl.text_params = init_clip_text(jax.random.key(2), TINY_TEXT)
    _, unet_params = init_sd_unet(jax.random.key(0), TINY_UNET, 8, 8)
    sampler = jax.jit(wl.make_sampler(num_steps=3, guidance_scale=7.5,
                                      latent_size=8, method="lms"))
    ctx = jnp.asarray(wl.get_learned_conditioning(["a photo", "a cat"]))
    out = sampler(unet_params, ctx, jax.random.key(1))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
