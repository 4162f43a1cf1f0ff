"""Pipeline parallelism (uurg_tpu/parallel/pipeline.py): the stage-sharded
microbatch pipeline must be numerically identical to the plain DiT forward,
for the forward AND the gradients (training = forward + transpose of the
ppermute schedule), on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.models.dit import DiTConfig, init_dit
from uurg_tpu.parallel import (dit_apply_pipelined, make_mesh,
                               shard_params_pp)

CFG = DiTConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=8, num_heads=4, num_classes=10, dtype=jnp.float32)


@pytest.fixture(scope="module")
def dit_setup():
    model, params = init_dit(jax.random.key(0), CFG)
    k = jax.random.key(1)
    x = jax.random.normal(k, (8, 8, 8, 4), jnp.float32)
    t = jnp.arange(8, dtype=jnp.int32) * 10
    y = jnp.arange(8, dtype=jnp.int32) % 10
    return model, params, x, t, y


@pytest.mark.parametrize("stages,microbatches", [
    pytest.param(8, 4, marks=pytest.mark.slow),  # fast-gate budget (r3
    # audit): one mid-size (4,2) + one edge (2,8) case stay in the gate
    (4, 2), (2, 8)])
def test_pipelined_forward_matches_plain(dit_setup, stages, microbatches):
    model, params, x, t, y = dit_setup
    ref = model.apply({"params": params}, x, t, y)
    mesh = make_mesh({"stage": stages},
                     devices=jax.devices()[:stages])
    out = jax.jit(lambda p, x, t, y: dit_apply_pipelined(
        p, CFG, x, t, y, mesh=mesh, n_microbatches=microbatches))(
        params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_pipelined_forward_with_cond_dropout(dit_setup):
    model, params, x, t, y = dit_setup
    keep = jnp.asarray([True, False] * 4)
    ref = model.apply({"params": params}, x, t, y, keep)
    mesh = make_mesh({"stage": 8})
    out = dit_apply_pipelined(params, CFG, x, t, y, mesh=mesh,
                              n_microbatches=4, cond_keep=keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_pipelined_grads_match_plain(dit_setup):
    """Training through the pipeline: grads wrt EVERY param leaf equal the
    plain path's (the eps-MSE loss the DiT workload trains with)."""
    model, params, x, t, y = dit_setup
    target = jax.random.normal(jax.random.key(2), (8, 8, 8, 8))
    mesh = make_mesh({"stage": 8})

    def loss_plain(p):
        return jnp.mean((model.apply({"params": p}, x, t, y) - target) ** 2)

    def loss_pp(p):
        out = dit_apply_pipelined(p, CFG, x, t, y, mesh=mesh,
                                  n_microbatches=8)
        return jnp.mean((out - target) ** 2)

    g_ref = jax.grad(loss_plain)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_shard_params_pp_placement(dit_setup):
    _, params, *_ = dit_setup
    mesh = make_mesh({"stage": 8})
    placed = shard_params_pp(params, mesh)
    qkv = placed["blocks"]["attn"]["qkv"]["kernel"]
    assert "stage" in str(qkv.sharding.spec)
    assert placed["final_linear"]["kernel"].sharding.spec == \
        jax.sharding.PartitionSpec()


def test_pipeline_rejects_bad_shapes(dit_setup):
    _, params, x, t, y = dit_setup
    mesh = make_mesh({"stage": 8})
    with pytest.raises(ValueError, match="microbatches"):
        dit_apply_pipelined(params, CFG, x, t, y, mesh=mesh,
                            n_microbatches=3)
    mesh3 = make_mesh({"stage": 3}, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="divisible"):
        dit_apply_pipelined(params, CFG, x, t, y, mesh=mesh3,
                            n_microbatches=4)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_dp_pp_composition_matches_plain(dit_setup):
    """dp x pp on a (data=2, stage=4) mesh: each data slice runs its own
    pipeline; forward and grads match the plain path."""
    model, params, x, t, y = dit_setup
    mesh = make_mesh({"data": 2, "stage": 4})
    target = jax.random.normal(jax.random.key(3), (8, 8, 8, 8))

    def loss(apply):
        return lambda p: jnp.mean((apply(p) - target) ** 2)

    plain = loss(lambda p: model.apply({"params": p}, x, t, y))
    pp = loss(lambda p: dit_apply_pipelined(
        p, CFG, x, t, y, mesh=mesh, n_microbatches=4))
    np.testing.assert_allclose(np.asarray(jax.jit(pp)(params)),
                               np.asarray(plain(params)), rtol=2e-5)
    g_ref = jax.grad(plain)(params)
    g_pp = jax.jit(jax.grad(pp))(params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                            jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path))
