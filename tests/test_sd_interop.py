"""CompVis SD-UNet checkpoint interop round-trip tests (tiny config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.io.sd_interop import (
    compvis_unet_to_flax,
    flax_unet_to_compvis,
    sd_unet_key_map,
)
from uurg_tpu.models.sd_unet import SDUNetConfig, init_sd_unet

pytestmark = pytest.mark.slow  # big-model fixtures

TINY = SDUNetConfig(model_channels=16, channel_mult=(1, 2),
                    num_res_blocks=1, attention_ds=(1,), num_heads=2,
                    context_dim=16, dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny():
    return init_sd_unet(jax.random.key(0), TINY, latent_size=8,
                        context_len=8)


def test_key_map_covers_all_params(tiny):
    _, params = tiny
    mapped = {path for _, path in sd_unet_key_map(TINY)}

    def walk(node, prefix=()):
        for k, v in node.items():
            if isinstance(v, dict):
                yield from walk(v, prefix + (k,))
            else:
                yield prefix + (k,)

    actual = set(walk(params))
    missing = actual - mapped
    assert not missing, f"params without CompVis mapping: {sorted(missing)[:6]}"


def test_roundtrip_preserves_values(tiny):
    model, params = tiny
    compvis = flax_unet_to_compvis(params, TINY)
    assert all(k.startswith("model.diffusion_model.") for k in compvis)
    back = compvis_unet_to_flax(compvis, TINY)

    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        node = back
        for p in path:
            node = node[p.key]
        np.testing.assert_allclose(np.asarray(leaf), node, rtol=1e-6,
                                   err_msg=str(path))


def test_roundtrip_forward_equivalence(tiny):
    model, params = tiny
    back = compvis_unet_to_flax(flax_unet_to_compvis(params, TINY), TINY)
    back = jax.tree_util.tree_map(jnp.asarray, back)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, 8, 16))
    t = jnp.asarray([3])
    a = model.apply({"params": params}, x, t, ctx)
    b = model.apply({"params": back}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_compvis_key_names_match_reference_schema():
    keys = [k for k, _ in sd_unet_key_map(SDUNetConfig())]
    assert "time_embed.0.weight" in keys
    assert "input_blocks.0.0.weight" in keys
    assert "input_blocks.1.0.in_layers.2.weight" in keys
    assert ("input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"
            in keys)
    assert "middle_block.1.proj_out.weight" in keys
    assert "output_blocks.0.0.out_layers.3.weight" in keys
    assert "out.2.weight" in keys
