"""Loss-second-moment timestep resampler vs a replica of the reference
semantics (DiT/diffusion/timestep_sampler.py:13-150)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.diffusion.timestep_sampler import (
    LossSecondMomentState,
    init_loss_second_moment,
    sample_timesteps,
    sampler_weights,
    uniform_timesteps,
    update_with_all_losses,
    update_with_local_losses,
)

T, K = 20, 4


class _RefResampler:
    """Host-side transcription of LossSecondMomentResampler's update/weights
    (timestep_sampler.py:120-150) to check ours against."""

    def __init__(self, T, K, uniform_prob=0.001):
        self.K, self.uniform_prob = K, uniform_prob
        self.history = np.zeros((T, K), np.float64)
        self.counts = np.zeros((T,), np.int64)

    def update(self, ts, losses):
        for t, loss in zip(ts, losses):
            if self.counts[t] == self.K:
                self.history[t, :-1] = self.history[t, 1:]
                self.history[t, -1] = loss
            else:
                self.history[t, self.counts[t]] = loss
                self.counts[t] += 1

    def weights(self):
        Tn = self.history.shape[0]
        if not (self.counts == self.K).all():
            return np.full((Tn,), 1.0 / Tn)
        w = np.sqrt(np.mean(self.history**2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / Tn
        return w


def test_prewarmup_uniform_weights_and_unit_importance():
    state = init_loss_second_moment(T, K)
    p = sampler_weights(state)
    np.testing.assert_allclose(np.asarray(p), np.full((T,), 1.0 / T),
                               rtol=1e-6)
    t, w = sample_timesteps(state, jax.random.key(0), 64)
    assert t.shape == (64,) and ((t >= 0) & (t < T)).all()
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)


def test_update_matches_reference_semantics_with_duplicates():
    rng = np.random.default_rng(0)
    state = init_loss_second_moment(T, K)
    ref = _RefResampler(T, K)
    upd = jax.jit(update_with_all_losses)
    for _ in range(8):
        # small t-range forces duplicates within a batch: ring-buffer shifts
        # must apply sequentially, like the reference's python loop
        ts = rng.integers(0, T, size=16)
        ls = rng.random(16).astype(np.float32)
        ref.update(ts, ls)
        state = upd(state, jnp.asarray(ts), jnp.asarray(ls))
    np.testing.assert_allclose(np.asarray(state.history),
                               ref.history.astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(state.counts), ref.counts)


def test_warmed_up_weights_match_reference_formula():
    rng = np.random.default_rng(1)
    state = init_loss_second_moment(T, K)
    ref = _RefResampler(T, K)
    # fill every slot: K passes over all timesteps
    for _ in range(K):
        ts = np.arange(T)
        ls = rng.random(T).astype(np.float32)
        ref.update(ts, ls)
        state = update_with_all_losses(state, jnp.asarray(ts),
                                       jnp.asarray(ls))
    np.testing.assert_allclose(np.asarray(sampler_weights(state)),
                               ref.weights(), rtol=1e-5)


def test_importance_weights_unbias_the_objective():
    # after warmup with a skewed loss profile, E[w * f(t)] under the
    # resampled distribution must match the uniform-t mean of f
    rng = np.random.default_rng(2)
    state = init_loss_second_moment(T, K)
    for _ in range(K):
        state = update_with_all_losses(
            state, jnp.arange(T),
            jnp.asarray((np.arange(T) + 1.0) ** 2, jnp.float32))
    f = jnp.asarray(rng.random(T), jnp.float32)
    t, w = sample_timesteps(state, jax.random.key(3), 200_000)
    est = float(jnp.mean(w * f[t]))
    assert abs(est - float(f.mean())) < 0.01
    # and the empirical t-distribution is the announced one
    p = np.asarray(sampler_weights(state))
    hist = np.bincount(np.asarray(t), minlength=T) / t.shape[0]
    np.testing.assert_allclose(hist, p, atol=0.01)


def test_shard_map_local_update_matches_global():
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("d",))
    ts = jnp.arange(4 * n, dtype=jnp.int32) % T
    ls = jnp.linspace(0.1, 1.0, 4 * n, dtype=jnp.float32)
    state = init_loss_second_moment(T, K)

    fn = shard_map(
        functools.partial(update_with_local_losses, axis_name="d"),
        mesh=mesh, in_specs=(P(), P("d"), P("d")), out_specs=P(),
        check_rep=False)
    out = fn(state, ts, ls)
    want = update_with_all_losses(state, ts, ls)
    np.testing.assert_allclose(np.asarray(out.history),
                               np.asarray(want.history), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.counts),
                                  np.asarray(want.counts))


def test_uniform_sampler_equivalent():
    t, w = uniform_timesteps(jax.random.key(0), 32, T)
    assert ((t >= 0) & (t < T)).all()
    np.testing.assert_array_equal(np.asarray(w), np.ones((32,), np.float32))


@pytest.mark.slow
def test_dit_workload_loss_with_sampler():
    from uurg_tpu.diffusion.gaussian import make_diffusion
    from uurg_tpu.models.dit import build_dit
    from uurg_tpu.workloads.dit import DiTWorkload

    model, cfg = build_dit("DiT-S/2", input_size=8, num_classes=10,
                           depth=2, dtype=jnp.float32)
    wl = DiTWorkload(model=model, cfg=cfg,
                     diffusion=make_diffusion("", 40, learn_sigma=True))
    params = wl.init_params(jax.random.key(0))
    state = init_loss_second_moment(40, 2)
    fn = jax.jit(wl.train_loss_with_sampler_fn())
    x = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
    y = jnp.zeros((4,), jnp.int32)
    loss, state = fn(params, (x, y), jax.random.key(2), state)
    assert jnp.isfinite(loss)
    assert int(state.counts.sum()) == 4
    # gradients flow through the weighted objective
    grads, state2 = jax.grad(fn, has_aux=True)(
        params, (x, y), jax.random.key(3), state)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    assert jnp.all(jnp.isfinite(leaf))
    assert int(state2.counts.sum()) == 8
