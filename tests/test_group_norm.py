"""Fused GroupNorm Pallas kernel: values + gradients vs the flax reference
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uurg_tpu.ops.group_norm import fused_group_norm, group_norm


def _ref(x, scale, bias, groups, eps=1e-6):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps,
                      param_dtype=jnp.float32)
    return gn.apply({"params": {"scale": scale, "bias": bias}}, x)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def test_fused_gn_matches_flax_fp32():
    x = _rand(jax.random.key(0), (2, 8, 8, 64)) * 2 + 0.3
    scale = _rand(jax.random.key(1), (64,)) * 0.1 + 1.0
    bias = _rand(jax.random.key(2), (64,)) * 0.1
    got = fused_group_norm(x, scale, bias, 32, 1e-6, True)
    want = _ref(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gn_matches_flax_bf16():
    x = _rand(jax.random.key(0), (2, 4, 4, 64), jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    got = fused_group_norm(x, scale, bias, 16, 1e-6, True)
    want = _ref(x.astype(jnp.float32), scale, bias, 16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_fused_gn_gradients_match():
    x = _rand(jax.random.key(3), (3, 4, 4, 32)) * 1.5
    scale = _rand(jax.random.key(4), (32,)) * 0.2 + 1.0
    bias = _rand(jax.random.key(5), (32,)) * 0.2
    tgt = _rand(jax.random.key(6), (3, 4, 4, 32))

    def loss_fused(x, s, b):
        return jnp.sum((fused_group_norm(x, s, b, 8, 1e-6, True) - tgt) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum((_ref(x, s, b, 8) - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_dispatcher_reference_path_matches_flax():
    # CPU backend -> reference path
    x = _rand(jax.random.key(7), (2, 5, 5, 48))
    scale = jnp.ones((48,)) * 1.1
    bias = jnp.zeros((48,)) + 0.05
    got = group_norm(x, scale, bias, groups=32)  # 48 % 32 != 0 -> groups 16
    want = _ref(x, scale, bias, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
