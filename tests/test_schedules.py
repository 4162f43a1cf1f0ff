"""Golden tests for beta schedules and forward-process math against the
closed-form reference formulas (DDPM/runners/diffusion.py:36-99)."""
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion import get_beta_schedule, make_schedule


def test_linear_schedule_endpoints():
    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=2e-2, num_diffusion_timesteps=1000)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)
    assert np.all(np.diff(betas) > 0)


@pytest.mark.parametrize("kind", ["linear", "quad", "const", "jsd", "sigmoid"])
def test_all_schedules_valid(kind):
    betas = get_beta_schedule(
        kind, beta_start=1e-4, beta_end=2e-2, num_diffusion_timesteps=100)
    assert betas.shape == (100,)
    assert np.all(betas > 0) and np.all(betas <= 1.0)


def test_quad_schedule_formula():
    betas = get_beta_schedule(
        "quad", beta_start=1e-4, beta_end=2e-2, num_diffusion_timesteps=50)
    expect = np.linspace(1e-4**0.5, 2e-2**0.5, 50) ** 2
    np.testing.assert_allclose(betas, expect, rtol=1e-12)


def test_alphas_cumprod_matches_manual():
    sched = make_schedule("linear", 1e-4, 2e-2, 100)
    betas = np.asarray(sched.betas)
    manual = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), manual,
                               rtol=1e-5)


def test_alpha_bar_padded_t_minus_one_is_one():
    sched = make_schedule(num_diffusion_timesteps=10)
    assert float(sched.alpha_bar_padded(jnp.asarray(-1))) == pytest.approx(1.0)
    assert float(sched.alpha_bar_padded(jnp.asarray(0))) == pytest.approx(
        float(sched.alphas_cumprod[0]))


def test_q_sample_closed_form():
    sched = make_schedule(num_diffusion_timesteps=10)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 0.5)
    t = jnp.asarray([3, 7])
    xt = sched.q_sample(x0, t, noise)
    a = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
    expect = (np.sqrt(a)[:, None, None, None] * 1.0
              + np.sqrt(1 - a)[:, None, None, None] * 0.5)
    np.testing.assert_allclose(
        np.asarray(xt), np.broadcast_to(expect, xt.shape), rtol=1e-5)


def test_fixedlarge_logvar():
    sched = make_schedule(num_diffusion_timesteps=10, var_type="fixedlarge")
    np.testing.assert_allclose(
        np.asarray(sched.logvar), np.log(np.asarray(sched.betas)), rtol=1e-6)
