"""train_method parameter-subset parity vs the reference's selection rules.

The reference picks trainable SD-UNet parameters with substring/prefix tests
on CompVis torch names (SD/train-scripts/train-esd.py:209-235). These tests
use an SD-v1-SHAPED tiny config (4 levels x 2 res blocks, so the torch block
numbering — input_blocks.0-11 / output_blocks.0-11 — matches the real model)
and assert, per mode, exactly which Flax layer heads are selected, with the
expectations transcribed independently from the reference rules:

  input_blocks.4  = down_1 res/attn 0     input_blocks.7  = down_2 res/attn 0
  output_blocks.6 = up_1 res/attn 0       output_blocks.8 = up_1 res/attn 2
  out.*           = norm_out / conv_out   time_embed      = time_embed_0/2
"""
import jax
import jax.numpy as jnp
import pytest

from uurg_tpu.models.sd_unet import (
    SDUNetConfig,
    init_sd_unet,
    train_method_leaf_mask,
    train_method_mask,
)

SDV1_SHAPED = SDUNetConfig(model_channels=8, channel_mult=(1, 2, 4, 4),
                           num_res_blocks=2, attention_ds=(1, 2, 4),
                           num_heads=2, context_dim=8, dtype=jnp.float32,
                           remat=False)

ALL_MODES = ("full", "xattn", "selfattn", "noxattn", "notime", "xlayer",
             "selflayer")


@pytest.fixture(scope="module")
def sd_shaped_params():
    # every test here selects by PYTREE PATH only, so abstract leaves
    # suffice: eval_shape traces the init without compiling or allocating
    # (the compiled init was 72s of the fast gate's budget on this box)
    return jax.eval_shape(
        lambda k: init_sd_unet(k, SDV1_SHAPED, latent_size=16,
                               context_len=8)[1],
        jax.random.key(0))


def selected_paths(params, method):
    mask = train_method_leaf_mask(params, method)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    return {"/".join(str(k.key) for k in path)
            for path, sel in flat if sel}


def all_paths(params):
    flat = jax.tree_util.tree_leaves_with_path(params)
    return {"/".join(str(k.key) for k in path) for path, _ in flat}


def test_full_selects_everything(sd_shaped_params):
    assert selected_paths(sd_shaped_params, "full") == all_paths(
        sd_shaped_params)


def test_xattn_exactly_attn2(sd_shaped_params):
    sel = selected_paths(sd_shaped_params, "xattn")
    expect = {p for p in all_paths(sd_shaped_params) if "attn2" in p}
    assert sel == expect and sel


def test_selfattn_exactly_attn1(sd_shaped_params):
    sel = selected_paths(sd_shaped_params, "selfattn")
    expect = {p for p in all_paths(sd_shaped_params) if "attn1" in p}
    assert sel == expect and sel


def test_noxattn_excludes_out_head_attn2_time_embed(sd_shaped_params):
    sel = selected_paths(sd_shaped_params, "noxattn")
    expect = {p for p in all_paths(sd_shaped_params)
              if "attn2" not in p
              and not p.startswith(("time_embed_", "norm_out", "conv_out"))}
    assert sel == expect
    # the r2 bug: attn1 / emb_proj / transformer norms MUST stay trainable
    assert any("attn1" in p for p in sel)
    assert any("emb_proj" in p for p in sel)
    assert any(p.startswith("up_0_") for p in sel)


def test_notime_excludes_out_head_and_time_embed_only(sd_shaped_params):
    sel = selected_paths(sd_shaped_params, "notime")
    expect = {p for p in all_paths(sd_shaped_params)
              if not p.startswith(("time_embed_", "norm_out", "conv_out"))}
    assert sel == expect
    # emb_proj (torch: ResBlock emb_layers) is NOT "time_embed" — kept
    assert any("emb_proj" in p for p in sel)


def test_xlayer_is_attn2_in_output_blocks_6_and_8(sd_shaped_params):
    sel = selected_paths(sd_shaped_params, "xlayer")
    # output_blocks.6 / .8 = level up_1 (second-from-bottom), j=0 and j=2
    expect = {p for p in all_paths(sd_shaped_params)
              if "attn2" in p
              and (p.startswith("up_1_attn_0/") or p.startswith("up_1_attn_2/"))}
    assert sel == expect and sel


def test_selflayer_is_attn1_in_input_blocks_4_and_7(sd_shaped_params):
    sel = selected_paths(sd_shaped_params, "selflayer")
    # input_blocks.4 = down_1 slot 0, input_blocks.7 = down_2 slot 0
    expect = {p for p in all_paths(sd_shaped_params)
              if "attn1" in p
              and (p.startswith("down_1_attn_0/")
                   or p.startswith("down_2_attn_0/"))}
    assert sel == expect and sel


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_gradient_mask_agrees_with_leaf_mask(sd_shaped_params):
    for mode in ALL_MODES:
        grad_mask = train_method_mask(sd_shaped_params, mode)
        leaf_mask = train_method_leaf_mask(sd_shaped_params, mode)
        flags = jax.tree_util.tree_map(
            lambda m: bool(jnp.max(m) > 0) if m.size else False, grad_mask)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: a == b, flags, leaf_mask)), mode
