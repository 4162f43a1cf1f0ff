"""Tests for the shared unlearning engine: Fisher accumulation, saliency
masks, EMA mixing, and the SFR-on two-phase step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.core import tree as tr
from uurg_tpu.train import make_optimizer
from uurg_tpu.unlearn import (
    SFRonConfig,
    accumulate_fisher,
    ema_update,
    fast_slow_mix,
    fisher_ratio_mask,
    make_per_sample_fisher_step,
    make_sfron_step,
    mask_sparsity,
    topk_saliency_mask,
)
from uurg_tpu.unlearn.saliency import pack_mask, unpack_mask
from uurg_tpu.unlearn.sfron import init_state


# --- Fisher ---------------------------------------------------------------

def quad_loss(params, batch, rng):
    x, y = batch
    pred = x @ params["w"] + params["b"]
    return jnp.mean((pred - y) ** 2)


def test_fisher_matches_manual_grad_squares():
    params = {"w": jnp.asarray([[1.0], [2.0]]), "b": jnp.asarray([0.5])}
    key = jax.random.key(0)
    batches = []
    for i in range(3):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (4, 2))
        y = jax.random.normal(k2, (4, 1))
        batches.append((x, y))

    fisher = accumulate_fisher(quad_loss, params, batches, jax.random.key(1))

    manual = {k: np.zeros_like(np.asarray(v)) for k, v in params.items()}
    for b in batches:
        g = jax.grad(quad_loss)(params, b, None)
        for k in manual:
            manual[k] += np.asarray(g[k]) ** 2 / len(batches)
    for k in manual:
        np.testing.assert_allclose(np.asarray(fisher[k]), manual[k], rtol=1e-5)


def test_per_sample_fisher_vmap():
    params = {"w": jnp.asarray([1.0, -2.0])}

    def per_example_loss(params, ex, rng):
        x, y = ex
        return (jnp.dot(x, params["w"]) - y) ** 2

    step = make_per_sample_fisher_step(per_example_loss)
    x = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    y = jnp.asarray([0.0, 0.0])
    fisher0 = {"w": jnp.zeros(2)}
    rngs = jax.random.split(jax.random.key(0), 2)
    out = step(fisher0, params, (x, y), rngs)
    # per-sample grads: ex0 -> [2*1*1, 0]; ex1 -> [0, 2*(-2)*1]
    expect = np.mean(np.asarray([[2.0, 0.0], [0.0, -4.0]]) ** 2, axis=0)
    np.testing.assert_allclose(np.asarray(out["w"]), expect, rtol=1e-5)


# --- Saliency masks -------------------------------------------------------

def test_fisher_ratio_mask_threshold():
    ff = {"a": jnp.asarray([4.0, 1.0, 0.0])}
    rf = {"a": jnp.asarray([1.0, 1.0, 2.0])}
    mask = fisher_ratio_mask(ff, rf, threshold=1.0)
    np.testing.assert_array_equal(np.asarray(mask["a"]), [1.0, 1.0, 0.0])
    assert mask_sparsity(mask) == pytest.approx(1 / 3)


def test_topk_mask_matches_double_argsort_ranking():
    rng = np.random.RandomState(0)
    g = {"a": jnp.asarray(rng.randn(10)), "b": jnp.asarray(rng.randn(3, 4))}
    ratio = 0.4
    mask = topk_saliency_mask(g, ratio)

    # reference ranking (Classification/unlearn/salun.py:163-195)
    flat = np.concatenate([np.abs(np.asarray(v)).ravel() for v in
                           [g["a"], g["b"]]])
    ranks = np.argsort(np.argsort(-flat))
    hard = (ranks < int(len(flat) * ratio)).astype(np.float32)
    got = np.concatenate([np.asarray(mask["a"]).ravel(),
                          np.asarray(mask["b"]).ravel()])
    np.testing.assert_array_equal(got, hard)


def test_topk_mask_extremes():
    g = {"a": jnp.asarray([1.0, 2.0])}
    assert mask_sparsity(topk_saliency_mask(g, 0.0)) == pytest.approx(1.0)
    assert mask_sparsity(topk_saliency_mask(g, 1.0)) == pytest.approx(0.0)


def test_mask_pack_roundtrip():
    rng = np.random.RandomState(1)
    mask = {"x": jnp.asarray((rng.rand(7, 5) > 0.5).astype(np.float32)),
            "y": {"z": jnp.asarray((rng.rand(13) > 0.3).astype(np.float32))}}
    restored = unpack_mask(pack_mask(mask))
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.asarray(mask["x"]))
    np.testing.assert_array_equal(np.asarray(restored["y"]["z"]),
                                  np.asarray(mask["y"]["z"]))


# --- EMA ------------------------------------------------------------------

def test_ema_update_formula():
    shadow = {"w": jnp.asarray(1.0)}
    params = {"w": jnp.asarray(2.0)}
    out = ema_update(shadow, params, mu=0.9)
    # (1 - mu) * param + mu * shadow
    assert float(out["w"]) == pytest.approx(0.1 * 2.0 + 0.9 * 1.0)


def test_fast_slow_mix_beta_one_is_identity():
    new = {"w": jnp.asarray(5.0)}
    prev = {"w": jnp.asarray(1.0)}
    out = fast_slow_mix(new, prev, beta=1.0)
    assert float(out["w"]) == pytest.approx(5.0)
    half = fast_slow_mix(new, prev, beta=0.5)
    assert float(half["w"]) == pytest.approx(3.0)


# --- tree utils -----------------------------------------------------------

def test_clip_by_global_norm():
    tree = {"a": jnp.asarray([3.0, 4.0])}  # norm 5
    clipped, norm = tr.clip_by_global_norm(tree, 1.0)
    assert float(norm) == pytest.approx(5.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               np.asarray([0.6, 0.8]), rtol=1e-4)
    unclipped, _ = tr.clip_by_global_norm(tree, 10.0)
    np.testing.assert_allclose(np.asarray(unclipped["a"]),
                               np.asarray([3.0, 4.0]), rtol=1e-5)


# --- SFR-on step ----------------------------------------------------------

def _linear_setup(mask=None, **cfg_kwargs):
    """Tiny 2-param linear regression forget/remain setup."""
    params = {"w": jnp.asarray([1.0, 1.0])}

    def loss(target):
        def fn(params, batch, rng):
            x, y = batch
            return jnp.mean((x @ params["w"] - y) ** 2)
        return fn

    # forget loss = (w[0] - 2)^2 = 1 at init (nonzero ascent gradient);
    # remain loss = (w[1] - 3)^2 = 4 at init
    forget_batch = (jnp.asarray([[1.0, 0.0]]), jnp.asarray([2.0]))
    remain_batch = (jnp.asarray([[0.0, 1.0]]), jnp.asarray([3.0]))

    defaults = dict(n_iters=10, forget_alpha=1.0, remain_alpha=1.0,
                    alpha_sched="const", forget_clip=None, remain_clip=None)
    defaults.update(cfg_kwargs)
    cfg = SFRonConfig(**defaults)
    opt = make_optimizer("sgd", 0.1, momentum=0.0, weight_decay=0.0)

    fl = lambda p, b, k: -jnp.mean((b[0] @ p["w"] - b[1]) ** 2)  # ascent
    rl = lambda p, b, k: jnp.mean((b[0] @ p["w"] - b[1]) ** 2)
    step = make_sfron_step(cfg, opt, fl, rl, donate=False)
    state = init_state(params, opt, mask=mask)
    return step, state, forget_batch, remain_batch, fl, rl


def test_sfron_forget_ascends_remain_descends():
    step, state, fb, rb, fl, rl = _linear_setup()
    f0 = float(-fl(state.params, fb, None))
    r0 = float(rl(state.params, rb, None))
    for _ in range(5):
        state, metrics = step(state, fb, rb, jax.random.key(0))
    f1 = float(-fl(state.params, fb, None))
    r1 = float(rl(state.params, rb, None))
    assert f1 > f0, "forget loss should increase (ascent)"
    assert r1 < r0, "remain loss should decrease (descent)"


def test_sfron_mask_blocks_forget_direction():
    # mask zeros the w[0] coordinate -> forget ascent (which only touches
    # w[0]) is fully blocked; remain still updates w[1]
    mask = {"w": jnp.asarray([0.0, 1.0])}
    step, state, fb, rb, fl, rl = _linear_setup(mask=mask)
    w_before = np.asarray(state.params["w"]).copy()
    state, _ = step(state, fb, rb, jax.random.key(0))
    w_after = np.asarray(state.params["w"])
    assert w_after[0] == pytest.approx(w_before[0])  # blocked
    assert w_after[1] != pytest.approx(w_before[1])  # remain step moved it


def test_sfron_forget_freq_skips():
    step, state, fb, rb, fl, rl = _linear_setup(forget_freq=2)
    # step 0: forget runs; step 1: skipped
    state, m0 = step(state, fb, rb, jax.random.key(0))
    state, m1 = step(state, fb, rb, jax.random.key(0))
    assert float(m0["forget_loss"]) != 0.0
    assert float(m1["forget_loss"]) == 0.0


def test_sfron_alpha_cosine_decays():
    step, state, fb, rb, *_ = _linear_setup(alpha_sched="cosine",
                                            forget_alpha=10.0, n_iters=10)
    alphas = []
    for _ in range(3):
        state, m = step(state, fb, rb, jax.random.key(0))
        alphas.append(float(m["forget_alpha"]))
    assert alphas[0] == pytest.approx(10.0)
    assert alphas[0] > alphas[1] > alphas[2]


def test_sfron_joint_method_runs():
    step, state, fb, rb, fl, rl = _linear_setup(method="joint")
    r0 = float(rl(state.params, rb, None))
    for _ in range(3):
        state, m = step(state, fb, rb, jax.random.key(0))
    assert np.isfinite(float(m["remain_loss"]))
    assert float(rl(state.params, rb, None)) < r0


def test_sfron_ema_shadow_tracks():
    params = {"w": jnp.asarray([1.0, 1.0])}
    cfg = SFRonConfig(n_iters=10, forget_alpha=0.0, alpha_sched="const",
                      forget_clip=None, remain_clip=None, ema_mu=0.5)
    opt = make_optimizer("sgd", 0.5, momentum=0.0)
    rl = lambda p, b, k: jnp.mean((b[0] @ p["w"] - b[1]) ** 2)
    fl = lambda p, b, k: jnp.asarray(0.0)
    step = make_sfron_step(cfg, opt, fl, rl, donate=False)
    state = init_state(params, opt, ema=True)
    rb = (jnp.asarray([[1.0, 1.0]]), jnp.asarray([5.0]))
    state, _ = step(state, rb, rb, jax.random.key(0))
    # shadow = 0.5*new + 0.5*old — strictly between
    w_new = np.asarray(state.params["w"])
    w_ema = np.asarray(state.ema_params["w"])
    assert np.all(w_ema > 1.0) and np.all(w_ema < w_new)


def test_sfron_lr_schedule_applied():
    params = {"w": jnp.asarray([0.0])}
    cfg = SFRonConfig(n_iters=4, forget_alpha=0.0, alpha_sched="const",
                      forget_clip=None, remain_clip=None)
    opt = make_optimizer("sgd", 1.0, momentum=0.0)
    from uurg_tpu.train import cosine_annealing
    sched = cosine_annealing(1.0, 4)
    rl = lambda p, b, k: jnp.mean((p["w"] - b) ** 2)
    fl = lambda p, b, k: jnp.asarray(0.0)
    step = make_sfron_step(cfg, opt, fl, rl, lr_schedule=sched, donate=False)
    state = init_state(params, opt)
    target = jnp.asarray([10.0])
    # with lr(0)=1.0 the first sgd step moves w by lr * 2*(w-10) = 20
    state, _ = step(state, target, target, jax.random.key(0))
    assert float(state.params["w"][0]) == pytest.approx(20.0, rel=1e-4)


def test_forget_alpha_zero_is_single_optimizer_update():
    """Pretrain reuses the SFR-on engine with forget_alpha=0 — that must
    compile to exactly ONE Adam update per step (reference
    DDPM/runners/diffusion.py:138-158), not a remain update plus a phantom
    zero-grad Adam apply (which decays mu and double-counts bias correction)."""
    import optax

    params = {"w": jnp.asarray([[1.0, -0.5], [0.3, 2.0]]),
              "b": jnp.asarray([0.1, -0.2])}
    batch = (jax.random.normal(jax.random.key(3), (4, 2)),
             jax.random.normal(jax.random.key(4), (4, 2)))

    def loss(params, b, rng):
        x, y = b
        return jnp.mean((x @ params["w"] + params["b"] - y) ** 2)

    opt = make_optimizer("adam", 1e-2)
    cfg = SFRonConfig(n_iters=10, forget_alpha=0.0, alpha_sched="const",
                      forget_freq=1, forget_clip=None, remain_clip=None,
                      ema_mu=None)
    # forget loss would blow up if ever evaluated
    boom = lambda p, b, k: 1e30 * tr.global_norm(p)
    step = make_sfron_step(cfg, opt, boom, loss, donate=False)
    state = init_state(params, opt, ema=False)
    new_state, metrics = step(state, batch, batch, jax.random.key(0))

    # manual single Adam update with the same rng stream
    k_f, k_r = jax.random.split(jax.random.fold_in(jax.random.key(0), 0))
    grads = jax.grad(loss)(params, batch, k_r)
    opt_state = opt.init(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    expected = optax.apply_updates(params, updates)

    for k in params:
        np.testing.assert_allclose(np.asarray(new_state.params[k]),
                                   np.asarray(expected[k]), rtol=1e-6)
    counts = [int(x) for x in jax.tree_util.tree_leaves(new_state.opt_state)
              if np.asarray(x).dtype == np.int32 and np.asarray(x).ndim == 0]
    assert all(c == 1 for c in counts), counts
    assert float(metrics["forget_loss"]) == 0.0


def test_scan_chunk_matches_per_step():
    """make_sfron_scan must reproduce the per-step path EXACTLY (same
    state.step-folded RNG stream) — the chunked dispatch is an execution
    detail, not a semantic change."""
    import numpy as np

    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state, make_sfron_scan

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    def rloss(p, batch, rng):
        x, y = batch
        return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

    floss = lambda p, b, k: -rloss(p, b, k)
    cfg = SFRonConfig(n_iters=8, forget_alpha=0.5, alpha_sched="cosine",
                      forget_freq=2, forget_clip=1.0, remain_clip=1.0,
                      ema_mu=0.99)
    opt = make_optimizer("adam", 1e-2)

    kx = jax.random.key(0)
    fb = [(jax.random.normal(jax.random.fold_in(kx, i), (6, 4)),
           jnp.ones((6, 4))) for i in range(8)]
    rb = [(jax.random.normal(jax.random.fold_in(kx, 100 + i), (6, 4)),
           -jnp.ones((6, 4))) for i in range(8)]

    step = make_sfron_step(cfg, opt, floss, rloss, donate=False)
    s1 = init_state(params, opt, ema=True)
    rng = jax.random.key(7)
    for i in range(8):
        s1, _ = step(s1, fb[i], rb[i], rng)

    run = make_sfron_scan(cfg, opt, floss, rloss, chunk=4)
    s2 = init_state(params, opt, ema=True)
    for c in range(2):
        f_chunk = (jnp.stack([fb[c * 4 + i][0] for i in range(4)]),
                   jnp.stack([fb[c * 4 + i][1] for i in range(4)]))
        r_chunk = (jnp.stack([rb[c * 4 + i][0] for i in range(4)]),
                   jnp.stack([rb[c * 4 + i][1] for i in range(4)]))
        s2, _ = run(s2, f_chunk, r_chunk, rng)

    assert int(s1.step) == int(s2.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params),
                    jax.tree_util.tree_leaves(s2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_init_state_preserves_mask_dtype_and_does_not_alias():
    """Round-4 advisor (high): the donation-safety copy used ``x + 0``,
    which type-promotes bool mask leaves to int32 (4x the HBM — OOM at
    DiT-XL scale). init_state must keep bool masks bool, and still return
    fresh buffers (no aliasing with the caller's trees)."""
    import optax
    from uurg_tpu.unlearn.sfron import init_state

    params = {"w": jnp.ones((4, 4), jnp.float32)}
    mask = {"w": jnp.array([[True, False]] * 2)}
    state = init_state(params, optax.sgd(0.1), ema=True, mask=mask)
    assert state.mask["w"].dtype == jnp.bool_, state.mask["w"].dtype
    assert state.params["w"].dtype == jnp.float32
    assert state.ema_params["w"].dtype == jnp.float32
    # fresh buffers: donating the state must not invalidate the originals
    assert state.params["w"] is not params["w"]
    assert state.mask["w"] is not mask["w"]
