"""Checkpoint interop: flax <-> torch-layout round-trips for the conditional
UNet (BASELINE 'interchangeable checkpoints' requirement)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.io.torch_interop import (
    flax_unet_params_to_torch,
    torch_unet_state_to_flax,
)
from uurg_tpu.models.unet_cond import UNetConfig, init_unet

TINY = UNetConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(4,), dropout=0.0, resolution=8,
                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_params():
    _, params = init_unet(jax.random.key(0), TINY)
    return params


@pytest.mark.slow
def test_roundtrip_flax_torch_flax(tiny_params):
    sd = flax_unet_params_to_torch(tiny_params)
    back = torch_unet_state_to_flax(sd)

    flat_a = jax.tree_util.tree_leaves_with_path(tiny_params)
    flat_b = jax.tree_util.tree_flatten(back)[0]
    assert len(flat_a) == len(flat_b)
    for (path, a) in flat_a:
        node = back
        for p in path:
            node = node[p.key]
        np.testing.assert_allclose(np.asarray(a), node, rtol=1e-6,
                                   err_msg=str(path))


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_torch_key_names_match_reference_schema(tiny_params):
    sd = flax_unet_params_to_torch(tiny_params)
    keys = set(sd)
    # spot-check the reference Conditional_Model naming
    # (DDPM/models/diffusion.py:195-327)
    assert "conv_in.weight" in keys
    assert "temb.dense.0.weight" in keys
    assert "cemb.dense.1.bias" in keys
    assert "classes_emb.weight" in keys
    assert "null_classes_emb" in keys
    assert "down.0.block.0.norm1.weight" in keys
    assert "down.0.block.0.temb_cemb_proj.weight" in keys
    assert "mid.attn_1.q.weight" in keys
    assert "norm_out.weight" in keys
    assert "conv_out.bias" in keys
    # layouts are torch: conv OIHW, linear (out,in), attn 1x1 conv 4-D
    assert sd["conv_in.weight"].ndim == 4
    assert sd["conv_in.weight"].shape[-2:] == (3, 3)
    assert sd["mid.attn_1.q.weight"].shape[-2:] == (1, 1)
    t0 = sd["temb.dense.0.weight"]
    assert t0.shape == (TINY.ch * 4, TINY.ch)  # (out, in)


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_module_prefix_stripped(tiny_params):
    sd = flax_unet_params_to_torch(tiny_params)
    prefixed = {f"module.{k}": v for k, v in sd.items()}
    back = torch_unet_state_to_flax(prefixed)
    a = np.asarray(tiny_params["conv_in"]["kernel"])
    np.testing.assert_allclose(a, back["conv_in"]["kernel"], rtol=1e-6)


@pytest.mark.slow
def test_forward_equivalence_after_roundtrip(tiny_params):
    """Converted params must produce identical model outputs."""
    model, _ = init_unet(jax.random.key(0), TINY)
    back = torch_unet_state_to_flax(flax_unet_params_to_torch(tiny_params))
    back = jax.tree_util.tree_map(jnp.asarray, back)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    t = jnp.asarray([1, 5])
    c = jnp.asarray([0, 3])
    out_a = model.apply({"params": tiny_params}, x, t, c)
    out_b = model.apply({"params": back}, x, t, c)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
