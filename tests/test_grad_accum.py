"""Gradient accumulation (SFRonConfig.grad_accum): microbatch scan inside
the fused two-phase step.

Semantics under test: with a mean-reduced loss, grad_accum=n over n
microbatch slices must produce EXACTLY the update of one n-times-larger
batch (sum/n of per-microbatch grads == full-batch grad, one optimizer
update per step), while model_state (BN stats) threads sequentially and
the RNG folds in the microbatch index.
"""
import jax
import jax.numpy as jnp
import numpy as np

from uurg_tpu.core import tree as tr
from uurg_tpu.train import make_optimizer
from uurg_tpu.unlearn import SFRonConfig, make_sfron_step, stack_microbatches
from uurg_tpu.unlearn.sfron import init_state


def mse_loss(params, batch, rng):
    x, y = batch
    return jnp.mean((x @ params["w"] + params["b"] - y) ** 2)


def _data(key, n, d=4):
    kx, ky = jax.random.split(key)
    return (jax.random.normal(kx, (n, d)),
            jax.random.normal(ky, (n,)))


def _params():
    return {"w": jnp.asarray([0.3, -1.2, 0.7, 0.05]),
            "b": jnp.asarray(0.1)}


def _mk(cfg_kwargs, opt, accum):
    cfg = SFRonConfig(n_iters=10, forget_alpha=1.0, alpha_sched="const",
                      grad_accum=accum, **cfg_kwargs)
    # ascent on the forget loss = minimizing its negation
    fl = lambda p, b, k: -mse_loss(p, b, k)
    return make_sfron_step(cfg, opt, fl, mse_loss, donate=False)


def _split(batch, n):
    """[B, ...] -> [n, B//n, ...] microbatch view."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:]), batch)


def test_accum_matches_full_batch_exactly():
    """grad_accum=2 on half-size microbatches == one full-size batch, for
    every piece of state (params, Adam moments, EMA)."""
    fb = _data(jax.random.key(1), 8)
    rb = _data(jax.random.key(2), 8)
    for clip in (None, 0.5):
        opt = make_optimizer("adam", 1e-2)
        kw = dict(forget_clip=clip, remain_clip=clip, ema_mu=0.9)
        step1 = _mk(kw, opt, 1)
        step2 = _mk(kw, opt, 2)
        s1 = init_state(_params(), opt, ema=True)
        s2 = init_state(_params(), opt, ema=True)
        for _ in range(3):
            s1, m1 = step1(s1, fb, rb, jax.random.key(0))
            s2, m2 = step2(s2, _split(fb, 2), _split(rb, 2),
                           jax.random.key(0))
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params),
                        jax.tree_util.tree_leaves(s2.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(float(m1["remain_loss"]),
                                   float(m2["remain_loss"]), rtol=1e-5)


def test_accum_joint_method_matches_full_batch():
    fb = _data(jax.random.key(3), 8)
    rb = _data(jax.random.key(4), 8)
    opt = make_optimizer("sgd", 1e-2, momentum=0.0)
    kw = dict(forget_clip=None, remain_clip=None, method="joint")
    s1 = init_state(_params(), opt)
    s2 = init_state(_params(), opt)
    step1 = _mk(kw, opt, 1)
    step4 = _mk(kw, opt, 4)
    s1, _ = step1(s1, fb, rb, jax.random.key(0))
    s2, _ = step4(s2, _split(fb, 4), _split(rb, 4), jax.random.key(0))
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_accum_respects_saliency_mask():
    fb = _data(jax.random.key(5), 8)
    rb = _data(jax.random.key(6), 8)
    mask = {"w": jnp.asarray([1.0, 0.0, 1.0, 0.0]), "b": jnp.asarray(0.0)}
    opt = make_optimizer("sgd", 5e-2, momentum=0.0)
    # forget-only dynamics: remain_alpha=0 keeps the remain update from
    # moving masked-out coordinates, so the mask effect is isolated
    cfg = SFRonConfig(n_iters=10, forget_alpha=1.0, alpha_sched="const",
                      remain_alpha=0.0, forget_clip=None, remain_clip=None,
                      grad_accum=2)
    fl = lambda p, b, k: -mse_loss(p, b, k)
    step = make_sfron_step(cfg, opt, fl, mse_loss, donate=False)
    s = init_state(_params(), opt, mask=mask)
    p0 = jax.tree_util.tree_map(np.asarray, s.params)
    s, _ = step(s, _split(fb, 2), _split(rb, 2), jax.random.key(0))
    w = np.asarray(s.params["w"])
    assert w[1] == p0["w"][1] and w[3] == p0["w"][3]  # masked out: frozen
    assert w[0] != p0["w"][0] and w[2] != p0["w"][2]
    assert float(s.params["b"]) == float(p0["b"])


def test_accum_threads_model_state_sequentially():
    """BN-style mutable state must see the microbatches one after another
    (like consecutive host steps), not a single merged update."""
    def loss_ms(params, mstate, batch, rng):
        x, y = batch
        # running mean with momentum .5, updated once per (micro)batch
        new = {"mu": 0.5 * mstate["mu"] + 0.5 * jnp.mean(x)}
        return jnp.mean((x @ params["w"] + params["b"] - y) ** 2), new

    fb = _data(jax.random.key(7), 8)
    rb = _data(jax.random.key(8), 8)
    opt = make_optimizer("sgd", 1e-2, momentum=0.0)
    cfg = SFRonConfig(n_iters=10, forget_alpha=0.0, alpha_sched="const",
                      forget_clip=None, remain_clip=None, grad_accum=2)
    step = make_sfron_step(cfg, opt, loss_ms, loss_ms, donate=False,
                           has_model_state=True)
    s = init_state(_params(), opt, model_state={"mu": jnp.asarray(0.0)})
    s, _ = step(s, _split(fb, 2), _split(rb, 2), jax.random.key(0))
    # forget phase is statically off (alpha=0): only remain microbatches hit
    rx = np.asarray(rb[0]).reshape(2, 4, 4)
    expect = 0.0
    for i in range(2):
        expect = 0.5 * expect + 0.5 * rx[i].mean()
    np.testing.assert_allclose(float(s.model_state["mu"]), expect, rtol=1e-5)


def test_stack_microbatches_shapes_and_tail():
    def gen():
        for i in range(5):
            yield (jnp.full((3, 2), i, jnp.float32), jnp.full((3,), i))

    out = list(stack_microbatches(gen(), 2))
    assert len(out) == 2  # ragged 5th batch dropped
    x, y = out[0]
    assert x.shape == (2, 3, 2) and y.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(out[1][0][1, 0, 0]), 3.0)


def test_stack_microbatches_passthrough_n1():
    def gen():
        yield from range(3)

    assert list(stack_microbatches(iter(gen()), 1)) == [0, 1, 2]


def test_amsgrad_rejects_nu_dtype():
    """nu_dtype silently no-oped under amsgrad (round-4 advisor, low):
    now it raises instead of leaving nu in f32 without warning."""
    import jax.numpy as jnp
    import pytest as _pytest

    from uurg_tpu.train import make_optimizer

    opt = make_optimizer("adam", 1e-3, amsgrad=True, nu_dtype=jnp.bfloat16)
    with _pytest.raises(NotImplementedError):
        opt.init({"w": jnp.ones((2,))})
