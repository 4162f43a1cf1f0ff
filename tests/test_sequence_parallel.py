"""Ring attention (uurg_tpu/parallel/sequence.py): exact-softmax parity with
the plain attention path, forward and gradients, on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.ops.flash_attention import _reference_attention
from uurg_tpu.parallel import make_mesh, ring_attention


def _qkv(key, B=2, H=3, T=16, D=8, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, H, T, D), dtype) for k in ks)


@pytest.mark.parametrize("seq", [2, 4, 8])
def test_ring_attention_matches_reference(seq):
    q, k, v = _qkv(jax.random.key(0))
    mesh = make_mesh({"seq": seq}, devices=jax.devices()[:seq])
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(
        q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_grads_match_reference():
    q, k, v = _qkv(jax.random.key(1))
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    tgt = jax.random.normal(jax.random.key(2), q.shape)

    def loss(fn):
        return lambda q, k, v: jnp.mean((fn(q, k, v) - tgt) ** 2)

    g_ref = jax.grad(loss(_reference_attention), argnums=(0, 1, 2))(q, k, v)
    g_sp = jax.jit(jax.grad(
        loss(lambda q, k, v: ring_attention(q, k, v, mesh=mesh)),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_ref, g_sp, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_ring_attention_dp_sp_composition():
    """(data=2, seq=4) mesh: batch shards over data, tokens over seq."""
    q, k, v = _qkv(jax.random.key(3), B=4, T=8)
    mesh = make_mesh({"data": 2, "seq": 4})
    out = ring_attention(q, k, v, mesh=mesh)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_attention_bf16_inputs():
    q, k, v = _qkv(jax.random.key(4), dtype=jnp.bfloat16)
    mesh = make_mesh({"seq": 8})
    out = ring_attention(q, k, v, mesh=mesh)
    assert out.dtype == jnp.bfloat16
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ring_attention_rejects_indivisible_tokens():
    q, k, v = _qkv(jax.random.key(5), T=12)
    mesh = make_mesh({"seq": 8})
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q, k, v, mesh=mesh)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_sequence_parallel_context_routes_model_attention():
    """The sequence_parallel context reroutes the shared attention
    dispatcher (so DiT/SD forwards become token-sharded with no model
    changes), and the model output is unchanged."""
    from uurg_tpu.models.dit import DiTConfig, init_dit
    from uurg_tpu.parallel import sequence_parallel
    from uurg_tpu.parallel import sequence as seq_mod

    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=32, depth=2, num_heads=4, num_classes=10,
                    dtype=jnp.float32)  # T = 16 tokens
    model, params = init_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2,), jnp.int32)
    ref = model.apply({"params": params}, x, t, y)

    calls = []
    orig = seq_mod.ring_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    mesh = make_mesh({"seq": 8})
    seq_mod.ring_attention = spy
    try:
        with sequence_parallel(mesh):
            out = model.apply({"params": params}, x, t, y)
    finally:
        seq_mod.ring_attention = orig
    assert len(calls) == cfg.depth  # every block's attention took the ring
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
