"""DiT torch-checkpoint interop tests: build a fake torch-style state dict,
convert, and check the flax tree structure matches init exactly."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.io.dit_interop import torch_dit_state_to_flax
from uurg_tpu.models.dit import DiTConfig, init_dit

TINY = DiTConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
                 depth=2, num_heads=2, num_classes=10, dtype=jnp.float32)


def fake_torch_state(cfg: DiTConfig, seed=0):
    rng = np.random.RandomState(seed)
    D = cfg.hidden_size
    p = cfg.patch_size

    def w(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    sd = {
        "x_embedder.proj.weight": w(D, cfg.in_channels, p, p),
        "x_embedder.proj.bias": w(D),
        "t_embedder.mlp.0.weight": w(D, 256),
        "t_embedder.mlp.0.bias": w(D),
        "t_embedder.mlp.2.weight": w(D, D),
        "t_embedder.mlp.2.bias": w(D),
        "y_embedder.embedding_table.weight": w(cfg.num_classes + 1, D),
        "final_layer.adaLN_modulation.1.weight": w(2 * D, D),
        "final_layer.adaLN_modulation.1.bias": w(2 * D),
        "final_layer.linear.weight": w(p * p * cfg.in_channels * 2, D),
        "final_layer.linear.bias": w(p * p * cfg.in_channels * 2),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        sd[b + "adaLN_modulation.1.weight"] = w(6 * D, D)
        sd[b + "adaLN_modulation.1.bias"] = w(6 * D)
        sd[b + "attn.qkv.weight"] = w(3 * D, D)
        sd[b + "attn.qkv.bias"] = w(3 * D)
        sd[b + "attn.proj.weight"] = w(D, D)
        sd[b + "attn.proj.bias"] = w(D)
        sd[b + "mlp.fc1.weight"] = w(4 * D, D)
        sd[b + "mlp.fc1.bias"] = w(4 * D)
        sd[b + "mlp.fc2.weight"] = w(D, 4 * D)
        sd[b + "mlp.fc2.bias"] = w(D)
    return sd


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda l: np.shape(l), t)


@pytest.mark.parametrize("scan", [True, False])
def test_converted_tree_matches_init_structure(scan):
    cfg = dataclasses.replace(TINY, scan_blocks=scan)
    _, init_params = init_dit(jax.random.key(0), cfg)
    conv = torch_dit_state_to_flax(fake_torch_state(cfg), cfg)
    a = _tree_shapes(init_params)
    b = _tree_shapes(conv)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for pa, pb in zip(jax.tree_util.tree_leaves_with_path(a),
                      jax.tree_util.tree_leaves_with_path(b)):
        assert pa[1] == pb[1], f"shape mismatch at {pa[0]}: {pa[1]} vs {pb[1]}"


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_converted_params_run_forward():
    cfg = dataclasses.replace(TINY, scan_blocks=True)
    model, _ = init_dit(jax.random.key(0), cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, torch_dit_state_to_flax(fake_torch_state(cfg), cfg))
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    out = model.apply({"params": params}, x, jnp.asarray([1, 5]),
                      jnp.asarray([0, 3]))
    assert out.shape == (2, 8, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_scan_and_loop_params_interchange():
    """Stacked (scan) params sliced per-layer must equal the loop layout —
    the two layouts are views of the same checkpoint."""
    cfg_scan = dataclasses.replace(TINY, scan_blocks=True)
    cfg_loop = dataclasses.replace(TINY, scan_blocks=False)
    sd = fake_torch_state(cfg_scan)
    p_scan = torch_dit_state_to_flax(sd, cfg_scan)
    p_loop = torch_dit_state_to_flax(sd, cfg_loop)
    np.testing.assert_allclose(
        p_scan["blocks"]["attn"]["qkv"]["kernel"][1],
        p_loop["block_1"]["attn"]["qkv"]["kernel"])
