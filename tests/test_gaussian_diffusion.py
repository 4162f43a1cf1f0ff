"""ADM Gaussian-diffusion tests (learned sigma, respacing, VB terms)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_diffusion,
    normal_kl,
    space_timesteps,
)


def test_normal_kl_zero_for_identical():
    m = jnp.asarray([0.5, -1.0])
    lv = jnp.asarray([0.1, 0.2])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0,
                               atol=1e-7)


def test_normal_kl_closed_form():
    # KL(N(1, e^0) || N(0, e^0)) = 0.5
    out = normal_kl(jnp.asarray(1.0), jnp.asarray(0.0),
                    jnp.asarray(0.0), jnp.asarray(0.0))
    assert float(out) == pytest.approx(0.5)


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim250")
    assert len(steps) == 250
    assert steps[0] == 0 and steps[1] - steps[0] == 4


def test_space_timesteps_sections():
    steps = space_timesteps(100, "10")
    assert len(steps) == 10
    assert steps[0] == 0 and steps[-1] == 99


def test_respaced_alphas_consistent():
    full = make_diffusion("", 100, learn_sigma=False)
    sub = make_diffusion("10", 100, learn_sigma=False)
    # alphas_cumprod of the respaced chain must equal the full chain's at
    # the selected timesteps
    sel = np.asarray(sub.timestep_map)
    full_acp = np.cumprod(1 - np.asarray(full.betas))
    sub_acp = np.cumprod(1 - np.asarray(sub.betas))
    np.testing.assert_allclose(sub_acp, full_acp[sel], rtol=1e-10)


def test_q_sample_matches_closed_form():
    d = make_diffusion("", 10, learn_sigma=False)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full_like(x0, 0.3)
    t = jnp.asarray([2, 7])
    out = d.q_sample(x0, t, noise)
    acp = np.cumprod(1 - np.asarray(d.betas))[np.asarray(t)]
    expect = (np.sqrt(acp)[:, None, None, None]
              + np.sqrt(1 - acp)[:, None, None, None] * 0.3)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(expect, out.shape), rtol=1e-5)


def test_training_losses_fixed_sigma_perfect_model_zero():
    d = make_diffusion("", 10, learn_sigma=False)
    x0 = jax.random.normal(jax.random.key(0), (4, 4, 4, 3))
    key = jax.random.key(1)
    t = jnp.asarray([0, 3, 5, 9])

    # oracle reproduces exact noise: eps = (x_t - sqrt(acp) x0)/sqrt(1-acp)
    acp = jnp.asarray(np.cumprod(1 - np.asarray(d.betas)), jnp.float32)

    def oracle(x_t, t_model, **kw):
        a = acp[t_model.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        return (x_t - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    loss = d.training_losses(oracle, x0, t, key)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)


def test_training_losses_learned_sigma_includes_vb():
    d = make_diffusion("", 10, learn_sigma=True)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    t = jnp.asarray([1, 5])

    def model(x_t, t_model, **kw):
        return jnp.concatenate([jnp.zeros_like(x_t), jnp.zeros_like(x_t)],
                               axis=-1)

    loss = d.training_losses(model, x0, t, jax.random.key(1))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_vb_gradient_only_trains_variance_head():
    # frozen-mean trick: d(loss)/d(eps-path) must equal the pure-MSE grad
    d = make_diffusion("", 10, learn_sigma=True)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    t = jnp.asarray([3, 6])

    def loss_of_eps_param(w):
        def model(x_t, t_model, **kw):
            return jnp.concatenate([x_t * w, jnp.zeros_like(x_t)], -1)
        return d.training_losses(model, x0, t, jax.random.key(1))

    def mse_only(w):
        d2 = make_diffusion("", 10, learn_sigma=False)

        def model(x_t, t_model, **kw):
            return x_t * w
        return d2.training_losses(model, x0, t, jax.random.key(1))

    g_hybrid = jax.grad(loss_of_eps_param)(1.0)
    g_mse = jax.grad(mse_only)(1.0)
    assert float(g_hybrid) == pytest.approx(float(g_mse), rel=1e-5)


def test_p_sample_loop_shapes_finite():
    d = make_diffusion("5", 50, learn_sigma=True)

    def model(x_t, t_model, **kw):
        return jnp.concatenate([jnp.zeros_like(x_t), jnp.zeros_like(x_t)], -1)

    out = d.p_sample_loop(model, (2, 4, 4, 3), jax.random.key(0))
    assert out.shape == (2, 4, 4, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_loop_deterministic_eta0():
    d = make_diffusion("5", 50, learn_sigma=False)
    model = lambda x, t, **kw: jnp.zeros_like(x)
    a = d.ddim_sample_loop(model, (1, 4, 4, 3), jax.random.key(3))
    b = d.ddim_sample_loop(model, (1, 4, 4, 3), jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
