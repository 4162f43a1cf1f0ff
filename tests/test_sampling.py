"""Sampler algebra tests (DDPM/functions/denoising.py parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion import make_schedule
from uurg_tpu.diffusion.sampling import (
    cfg_model_fn,
    ddim_sample,
    ddpm_sample,
    make_step_sequence,
)


def _oracle_model(sched, x0):
    """Model that returns the exact eps consistent with (x_t, x0)."""

    def fn(x, t_vec):
        a = sched.alpha_bar_padded(t_vec).reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    return fn


def test_ddim_oracle_recovers_x0_exactly():
    # With an exact eps-oracle and eta=0, DDIM is deterministic and lands on
    # x0 (final step has alpha_bar(-1) = 1).
    sched = make_schedule(num_diffusion_timesteps=20)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3)) * 0.5
    x_T = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    out = ddim_sample(_oracle_model(sched, x0), sched, x_T, list(range(20)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddim_respaced_also_recovers_x0():
    sched = make_schedule(num_diffusion_timesteps=100)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3)) * 0.5
    x_T = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    seq = make_step_sequence(100, 10)
    out = ddim_sample(_oracle_model(sched, x0), sched, x_T, seq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddim_single_step_formula():
    # one step t=5 -> t_next=3 checked against the closed-form update
    sched = make_schedule(num_diffusion_timesteps=10)
    x = jax.random.normal(jax.random.key(2), (1, 2, 2, 1))
    et = jnp.full_like(x, 0.3)

    out = ddim_sample(lambda xx, tt: et, sched, x, [3, 5])
    # manual: step (5 -> 3), then (3 -> -1)
    abar = np.concatenate([[1.0], np.asarray(sched.alphas_cumprod)])
    cur = np.asarray(x)
    for t, tn in [(5, 3), (3, -1)]:
        at, atn = abar[t + 1], abar[tn + 1]
        x0t = (cur - 0.3 * np.sqrt(1 - at)) / np.sqrt(at)
        cur = np.sqrt(atn) * x0t + np.sqrt(1 - atn) * 0.3
    np.testing.assert_allclose(np.asarray(out), cur, rtol=1e-4, atol=1e-5)


def test_ddpm_sample_finite_and_deterministic_given_key():
    sched = make_schedule(num_diffusion_timesteps=10)
    x_T = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    model = lambda x, t: jnp.zeros_like(x)
    a = ddpm_sample(model, sched, x_T, list(range(10)), key=jax.random.key(7))
    b = ddpm_sample(model, sched, x_T, list(range(10)), key=jax.random.key(7))
    assert np.all(np.isfinite(np.asarray(a)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddpm_x0_clamped():
    # huge model output drives x0 out of range; ancestral step must clamp
    sched = make_schedule(num_diffusion_timesteps=10)
    x_T = jnp.ones((1, 2, 2, 1)) * 10.0
    model = lambda x, t: jnp.ones_like(x) * -100.0
    out = ddpm_sample(model, sched, x_T, [0], key=jax.random.key(0))
    # single step t=0 -> -1: beta_t = 1 - a0, x0 clamped to 1.0, no noise
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_cfg_double_forward_combination():
    labels = jnp.asarray([0, 1])
    scale = 2.0

    def apply_fn(x, t, c, keep):
        # conditional branch returns +1, unconditional returns -1
        return jnp.where(keep[:, None, None, None],
                         jnp.ones_like(x), -jnp.ones_like(x))

    fn = cfg_model_fn(apply_fn, labels, scale)
    out = fn(jnp.zeros((2, 2, 2, 1)), jnp.zeros((2,), jnp.int32))
    # (1+s)*1 - s*(-1) = 1 + 2s
    np.testing.assert_allclose(np.asarray(out), 1 + 2 * scale)


def test_cfg_scale_zero_single_forward():
    labels = jnp.asarray([0, 1])
    calls = []

    def apply_fn(x, t, c, keep):
        calls.append(x.shape[0])
        return jnp.ones_like(x)

    fn = cfg_model_fn(apply_fn, labels, 0.0)
    fn(jnp.zeros((2, 2, 2, 1)), jnp.zeros((2,), jnp.int32))
    assert calls == [2]  # no batch doubling when scale == 0


def test_make_step_sequence_uniform():
    seq = make_step_sequence(1000, 50)
    assert seq[0] == 0 and len(seq) == 50
    assert np.all(np.diff(seq) == 20)


def test_ddim_sample_till_full_matches_ddim_sample():
    # till=0 runs the whole chain -> identical to ddim_sample (eta=0)
    from uurg_tpu.diffusion.sampling import ddim_sample_till

    sched = make_schedule(num_diffusion_timesteps=100)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3)) * 0.3
    x_T = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    seq = make_step_sequence(100, 10, offset=1)
    full = ddim_sample(_oracle_model(sched, x0), sched, x_T, seq)
    till0 = ddim_sample_till(_oracle_model(sched, x0), sched, x_T, seq, 0)
    np.testing.assert_allclose(np.asarray(full), np.asarray(till0),
                               atol=1e-5)


def test_ddim_sample_till_partial_step_count():
    # till=len(seq) performs exactly ONE step (ldm ddim.py:241-281:
    # indices total-1 .. till-1); verify by replicating that single update.
    from uurg_tpu.diffusion.sampling import ddim_sample_till

    sched = make_schedule(num_diffusion_timesteps=100)
    x_T = jax.random.normal(jax.random.key(1), (1, 4, 4, 3))
    seq = make_step_sequence(100, 10, offset=1)
    et = jnp.full_like(x_T, 0.1)
    model = lambda x, t: et
    out = ddim_sample_till(model, sched, x_T, seq, len(seq))
    t, t_next = int(seq[-1]), int(seq[-2])
    at = sched.alpha_bar_padded(jnp.asarray(t))
    atn = sched.alpha_bar_padded(jnp.asarray(t_next))
    x0_t = (x_T - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
    want = jnp.sqrt(atn) * x0_t + jnp.sqrt(1 - atn) * et
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_ddim_sample_till_dynamic_under_jit():
    # `till` traced: one compile serves every value
    from uurg_tpu.diffusion.sampling import ddim_sample_till

    sched = make_schedule(num_diffusion_timesteps=50)
    x_T = jax.random.normal(jax.random.key(0), (1, 4, 4, 3))
    seq = make_step_sequence(50, 5, offset=1)
    model = _oracle_model(sched, jnp.zeros_like(x_T))
    f = jax.jit(lambda till: ddim_sample_till(model, sched, x_T, seq, till))
    outs = [np.asarray(f(t)) for t in range(len(seq) + 1)]
    # fewer denoise steps -> noisier output (larger norm vs x0=0 target)
    norms = [np.linalg.norm(o) for o in outs]
    assert norms[0] < norms[-1]
    for o in outs:
        assert np.all(np.isfinite(o))


def test_plms_constant_eps_matches_ddim():
    # With a constant eps model every AB combination collapses to that eps,
    # so PLMS == DDIM(eta=0) exactly.
    from uurg_tpu.diffusion.sampling import plms_sample

    sched = make_schedule(num_diffusion_timesteps=100)
    x_T = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    seq = make_step_sequence(100, 10, offset=1)
    et = jnp.full_like(x_T, 0.07)
    model = lambda x, t: et
    got = plms_sample(model, sched, x_T, seq)
    want = ddim_sample(model, sched, x_T, seq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_plms_oracle_recovers_x0():
    from uurg_tpu.diffusion.sampling import plms_sample

    sched = make_schedule(num_diffusion_timesteps=50)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3)) * 0.3
    x_T = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    seq = make_step_sequence(50, 10)
    out = plms_sample(_oracle_model(sched, x0), sched, x_T, seq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_plms_single_step():
    from uurg_tpu.diffusion.sampling import plms_sample

    sched = make_schedule(num_diffusion_timesteps=10)
    x_T = jax.random.normal(jax.random.key(0), (1, 4, 4, 3))
    out = plms_sample(lambda x, t: jnp.zeros_like(x), sched, x_T, [9])
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))
