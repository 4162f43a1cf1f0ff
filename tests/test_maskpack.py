"""Bit-packed saliency masks + selectable Adam moment dtypes.

Memory-policy features that buy HBM headroom on a 16GB chip (DiT-XL/2:
bool mask 675MB -> 84MB packed; f32 nu 2.7GB -> 1.35GB bf16), unlocking
faster remat policies for the two-phase step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from uurg_tpu.core import tree as tr
from uurg_tpu.core.tree import PackedMask, pack_mask


def _mask_tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "a": jax.random.uniform(k1, (7, 33)) > 0.5,     # non-multiple-of-8
        "b": jax.random.uniform(k2, (128,)) > 0.2,
        "c": {"w": jax.random.uniform(k3, (4, 4, 3, 8)) > 0.8},
    }


def test_pack_roundtrip():
    mask = _mask_tree(jax.random.key(0))
    packed = pack_mask(mask)
    for m, p in zip(jax.tree_util.tree_leaves(mask),
                    jax.tree_util.tree_leaves(
                        packed, is_leaf=lambda n: isinstance(n, PackedMask))):
        assert isinstance(p, PackedMask)
        assert p.bits.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(p.unpack(jnp.bool_)),
                                      np.asarray(m))


def test_tree_mul_packed_matches_bool():
    mask = _mask_tree(jax.random.key(1))
    grads = jax.tree_util.tree_map(
        lambda m: jax.random.normal(jax.random.key(m.size), m.shape), mask)
    want = tr.tree_mul(grads, mask)
    got = tr.tree_mul(grads, pack_mask(mask))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        want, got)


def test_tree_mul_packed_inside_jit():
    mask = pack_mask(_mask_tree(jax.random.key(2)))
    x = {"a": jnp.ones((7, 33)), "b": jnp.ones((128,)),
         "c": {"w": jnp.ones((4, 4, 3, 8))}}
    out = jax.jit(tr.tree_mul)(x, mask)
    total = sum(float(jnp.sum(l)) for l in jax.tree_util.tree_leaves(out))
    assert total == float(tr.tree_count_nonzero(mask))


def test_size_sparsity_on_packed():
    mask = _mask_tree(jax.random.key(3))
    packed = pack_mask(mask)
    assert tr.tree_size(packed) == tr.tree_size(mask)
    assert int(tr.tree_count_nonzero(packed)) == int(
        tr.tree_count_nonzero(mask))
    np.testing.assert_allclose(float(tr.sparsity(packed)),
                               float(tr.sparsity(mask)), rtol=1e-6)


def test_sfron_step_packed_mask_matches_bool():
    """The fused two-phase step produces identical params with a packed
    mask vs the same mask as a bool pytree."""
    from uurg_tpu.train import make_optimizer
    from uurg_tpu.unlearn import SFRonConfig, make_sfron_step
    from uurg_tpu.unlearn.sfron import init_state

    def loss(p, batch, rng):
        x, y = batch
        pred = x @ p["w"] + p["b"]
        return jnp.mean((pred - y) ** 2)

    params = {"w": jax.random.normal(jax.random.key(0), (8, 4)),
              "b": jnp.zeros((4,))}
    mask = {"w": jax.random.uniform(jax.random.key(1), (8, 4)) > 0.5,
            "b": jnp.ones((4,), bool)}
    opt = make_optimizer("adam", 1e-3)
    cfg = SFRonConfig(n_iters=10, forget_alpha=1.0, remain_alpha=1.0,
                      alpha_sched="const", forget_clip=1.0, remain_clip=None)
    step = make_sfron_step(cfg, opt, lambda p, b, k: -loss(p, b, k), loss,
                           donate=False)
    batch = (jax.random.normal(jax.random.key(2), (16, 8)),
             jax.random.normal(jax.random.key(3), (16, 4)))

    s_bool = init_state(params, opt, mask=mask)
    s_pack = init_state(params, opt, mask=pack_mask(mask))
    for i in range(3):
        s_bool, _ = step(s_bool, batch, batch, jax.random.key(i))
        s_pack, _ = step(s_pack, batch, batch, jax.random.key(i))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_bool.params, s_pack.params)


@pytest.mark.parametrize("name", ["adam", "adamw"])
def test_nu_dtype_f32_matches_optax(name):
    """nu_dtype=None routes through optax; explicit f32 through the custom
    transform — same numbers (same math, same bias correction)."""
    from uurg_tpu.train import make_optimizer

    params = {"w": jax.random.normal(jax.random.key(0), (5, 3))}
    grads = {"w": jax.random.normal(jax.random.key(1), (5, 3))}
    ref = make_optimizer(name, 1e-3, weight_decay=0.01)
    alt = make_optimizer(name, 1e-3, weight_decay=0.01,
                         nu_dtype=jnp.float32)
    s_ref, s_alt = ref.init(params), alt.init(params)
    p_ref, p_alt = params, params
    for _ in range(4):
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        u_alt, s_alt = alt.update(grads, s_alt, p_alt)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_alt = optax.apply_updates(p_alt, u_alt)
    np.testing.assert_allclose(np.asarray(p_ref["w"]),
                               np.asarray(p_alt["w"]), rtol=1e-6, atol=1e-7)


def test_nu_dtype_bf16_state_and_accuracy():
    from uurg_tpu.train import make_optimizer

    params = {"w": jax.random.normal(jax.random.key(0), (64, 32))}
    opt16 = make_optimizer("adamw", 1e-3, mu_dtype=jnp.bfloat16,
                           nu_dtype=jnp.bfloat16)
    opt32 = make_optimizer("adamw", 1e-3)
    s16, s32 = opt16.init(params), opt32.init(params)
    adam16 = s16.inner_state[0]
    assert jax.tree_util.tree_leaves(adam16.mu)[0].dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(adam16.nu)[0].dtype == jnp.bfloat16
    p16, p32 = params, params
    for i in range(8):
        g = {"w": jax.random.normal(jax.random.key(i + 1), (64, 32))}
        u16, s16 = opt16.update(g, s16, p16)
        u32, s32 = opt32.update(g, s32, p32)
        p16 = optax.apply_updates(p16, u16)
        p32 = optax.apply_updates(p32, u32)
    # bf16 second moment perturbs the denominator by <1%; after 8 steps of
    # lr=1e-3 updates the params must still track the f32 run closely
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=0.02, atol=2e-4)


def test_mask_is_packed_detects_leaf_type():
    from uurg_tpu.core.tree import mask_is_packed, pack_mask

    raw = {"a": {"w": jnp.ones((4, 3)) > 0}}
    assert not mask_is_packed(raw)
    assert mask_is_packed(pack_mask(raw))
    assert not mask_is_packed(None)
