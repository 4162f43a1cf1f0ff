"""Unit tests for eps-losses and the adaptive (adaga) weighting, golden-tested
against the reference formulas (DDPM/functions/losses.py:5-72)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion import (
    adaptive_loss,
    adaptive_weights,
    cosine_alpha_decay,
    make_schedule,
    noise_estimation_loss,
)


def test_noise_estimation_loss_perfect_model_is_zero():
    sched = make_schedule(num_diffusion_timesteps=10)
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    t = jnp.asarray([0, 3, 5, 9])

    def oracle(x_t, t_vec):
        # recover the exact noise from x_t: eps = (x_t - sqrt(a) x0)/sqrt(1-a)
        a = sched.alpha_bar(t_vec).reshape(-1, 1, 1, 1)
        return (x_t - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    loss = noise_estimation_loss(oracle, sched, x0, t, noise)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)


def test_noise_estimation_loss_reduction_matches_reference():
    # reference: per-sample sum over (H, W, C), then mean over batch
    sched = make_schedule(num_diffusion_timesteps=10)
    x0 = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.key(1), (4, 8, 8, 3))
    t = jnp.asarray([1, 2, 3, 4])

    def zero_model(x_t, t_vec):
        return jnp.zeros_like(x_t)

    per_sample = noise_estimation_loss(
        zero_model, sched, x0, t, noise, keepdim=True)
    total = noise_estimation_loss(zero_model, sched, x0, t, noise)
    expect = np.sum(np.asarray(noise) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(per_sample), expect, rtol=1e-5)
    assert float(total) == pytest.approx(float(expect.mean()), rel=1e-5)


def test_adaptive_weights_reference_formula():
    losses = jnp.asarray([1.0, 2.0, 4.0])
    lambd = 0.5
    w = adaptive_weights(losses, lambd, eps=1e-8)
    coef = 1.0 / (np.asarray(losses) ** lambd + 1e-8)
    expect = coef / coef.sum() * 3
    np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-6)
    # adaga downweights already-forgotten (high-loss) samples
    assert w[0] > w[1] > w[2]


def test_adaptive_loss_matches_reference():
    losses = jnp.asarray([0.5, 1.5, 3.0, 8.0])
    lambd = 0.5
    out = adaptive_loss(losses, lambd, eps=1e-8)
    coef = 1.0 / (np.asarray(losses) ** lambd + 1e-8)
    expect = (coef / coef.sum() * np.asarray(losses) * 4).mean()
    assert float(out) == pytest.approx(float(expect), rel=1e-6)


def test_adaptive_loss_gradient_ignores_coef():
    # coefficients are detached: d(ad_loss)/d(loss_i) == w_i / n exactly
    losses = jnp.asarray([1.0, 2.0, 4.0])
    lambd = 1.0

    grad = jax.grad(lambda l: adaptive_loss(l, lambd))(losses)
    w = adaptive_weights(losses, lambd)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(w) / 3, rtol=1e-5)


def test_cosine_alpha_decay_endpoints():
    assert float(cosine_alpha_decay(10.0, 0, 100)) == pytest.approx(10.0)
    assert float(cosine_alpha_decay(10.0, 50, 100)) == pytest.approx(5.0)
    assert float(cosine_alpha_decay(10.0, 100, 100)) == pytest.approx(0.0, abs=1e-6)
