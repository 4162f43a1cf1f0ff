"""Diffusers-layout SD UNet export tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.io.diffusers_interop import flax_unet_to_diffusers
from uurg_tpu.models.sd_unet import SDUNetConfig, init_sd_unet

TINY = SDUNetConfig(model_channels=16, channel_mult=(1, 2),
                    num_res_blocks=1, attention_ds=(1,), num_heads=2,
                    context_dim=16, dtype=jnp.float32)


@pytest.mark.slow
def test_diffusers_export_key_schema_and_layouts():
    _, params = init_sd_unet(jax.random.key(0), TINY, 8, 8)
    sd = flax_unet_to_diffusers(params, TINY)
    keys = set(sd)
    assert "time_embedding.linear_1.weight" in keys
    assert "conv_in.weight" in keys
    assert "down_blocks.0.resnets.0.conv1.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight" in keys
    assert "down_blocks.0.downsamplers.0.conv.weight" in keys
    assert "mid_block.attentions.0.proj_out.weight" in keys
    # deepest level (i=1) is up_blocks.0; it upsamples, the last one doesn't
    assert "up_blocks.0.resnets.0.conv1.weight" in keys
    assert "up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "up_blocks.1.resnets.0.conv1.weight" in keys
    assert "conv_norm_out.weight" in keys and "conv_out.bias" in keys
    # torch layouts
    assert sd["conv_in.weight"].shape[-2:] == (3, 3)          # OIHW
    assert sd["time_embedding.linear_1.weight"].shape == (64, 16)  # (out,in)


@pytest.mark.slow
def test_diffusers_export_value_roundtrip_spotcheck():
    _, params = init_sd_unet(jax.random.key(0), TINY, 8, 8)
    sd = flax_unet_to_diffusers(params, TINY)
    np.testing.assert_allclose(
        sd["down_blocks.0.resnets.0.conv1.weight"],
        np.asarray(params["down_0_res_0"]["conv1"]["kernel"]).transpose(
            3, 2, 0, 1), rtol=1e-6)
    np.testing.assert_allclose(
        sd["mid_block.resnets.1.time_emb_proj.weight"],
        np.asarray(params["mid_res_2"]["emb_proj"]["kernel"]).T, rtol=1e-6)
