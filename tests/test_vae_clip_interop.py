"""VAE/CLIP converter structure tests against tiny fake CompVis/HF dicts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uurg_tpu.io.vae_clip_interop import compvis_vae_to_flax, hf_clip_text_to_flax
from uurg_tpu.models.autoencoder_kl import VAEConfig, init_vae
from uurg_tpu.models.clip_text import CLIPTextConfig, init_clip_text

TINY_VAE = VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     dtype=jnp.float32)
TINY_TEXT = CLIPTextConfig(vocab_size=64, max_length=8, hidden_size=16,
                           depth=2, num_heads=2)


def _shapes(t):
    return jax.tree_util.tree_map(lambda l: np.shape(l), t)


def fake_compvis_vae(cfg: VAEConfig, seed=0):
    """Build a CompVis-style state dict by converting our init params the
    other way around (shape-driven)."""
    rng = np.random.RandomState(seed)
    _, params = init_vae(jax.random.key(0), cfg, resolution=16)
    sd = {}

    def put(key, shape_like, conv=False, attn=False):
        v = np.asarray(shape_like, np.float32)
        if attn:
            sd[key] = rng.randn(v.shape[1], v.shape[0], 1, 1).astype(np.float32)
        elif conv:
            sd[key] = rng.randn(v.shape[3], v.shape[2], v.shape[0],
                                v.shape[1]).astype(np.float32)
        else:
            sd[key] = rng.randn(*v.shape).astype(np.float32)

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
                continue
            # reverse-map our path to a CompVis key
            side = path[0]
            rest = path[1:] + (k,)
            key = _flax_path_to_compvis(side, rest)
            if key is None:
                continue
            is_conv = (k == "kernel" and np.ndim(v) == 4)
            is_attn = (k == "kernel" and np.ndim(v) == 2
                       and "attn" in "/".join(path))
            put("first_stage_model." + key, v, conv=is_conv, attn=is_attn)

    walk(params, ())
    return sd


def _flax_path_to_compvis(side, rest):
    import re

    mod = rest[0]
    leaf = rest[-1]
    suffix = {"kernel": "weight", "bias": "bias", "scale": "weight"}[leaf]
    if side in ("quant_conv", "post_quant_conv"):
        return f"{side}.{suffix}"
    name_map = {"conv_in": "conv_in", "conv_out": "conv_out",
                "norm_out": "norm_out", "mid_res_1": "mid.block_1",
                "mid_res_2": "mid.block_2", "mid_attn": "mid.attn_1"}
    if mod in name_map:
        base = name_map[mod]
    elif (m := re.match(r"down_(\d+)_res_(\d+)", mod)):
        base = f"down.{m.group(1)}.block.{m.group(2)}"
    elif (m := re.match(r"up_(\d+)_res_(\d+)", mod)):
        base = f"up.{m.group(1)}.block.{m.group(2)}"
    elif (m := re.match(r"down_(\d+)_downsample", mod)):
        return f"{side}.down.{m.group(1)}.downsample.conv.{suffix}"
    elif (m := re.match(r"up_(\d+)_upsample", mod)):
        return f"{side}.up.{m.group(1)}.upsample.conv.{suffix}"
    else:
        return None
    inner = rest[1] if len(rest) > 2 and rest[1] != "GroupNorm_0" else None
    if rest[1:-1] and rest[1] in ("norm1", "norm2", "norm"):
        nm = rest[1] if rest[1] != "norm" else "norm"
        return f"{side}.{base}.{nm}.{suffix}"
    if inner == "shortcut":
        return f"{side}.{base}.nin_shortcut.{suffix}"
    if inner in ("q", "k", "v", "proj_out", "conv1", "conv2"):
        return f"{side}.{base}.{inner}.{suffix}"
    if mod in ("conv_in", "conv_out"):
        return f"{side}.{mod}.{suffix}"
    if mod == "norm_out":
        return f"{side}.norm_out.{suffix}"
    return f"{side}.{base}.{suffix}"


@pytest.mark.slow
def test_vae_converter_matches_init_structure():
    sd = fake_compvis_vae(TINY_VAE)
    conv = compvis_vae_to_flax(sd, TINY_VAE)
    _, init_params = init_vae(jax.random.key(0), TINY_VAE, resolution=16)
    a, b = _shapes(init_params), _shapes(conv)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for (pa, sa), (pb, sb) in zip(
            jax.tree_util.tree_leaves_with_path(a),
            jax.tree_util.tree_leaves_with_path(b)):
        assert sa == sb, f"{pa}: {sa} vs {sb}"


def fake_hf_clip(cfg: CLIPTextConfig, seed=0):
    rng = np.random.RandomState(seed)
    D = cfg.hidden_size
    sd = {
        "embeddings.token_embedding.weight": rng.randn(cfg.vocab_size, D),
        "embeddings.position_embedding.weight": rng.randn(cfg.max_length, D),
        "final_layer_norm.weight": rng.randn(D),
        "final_layer_norm.bias": rng.randn(D),
    }
    for i in range(cfg.depth):
        b = f"encoder.layers.{i}."
        for n in ("q", "k", "v"):
            sd[b + f"self_attn.{n}_proj.weight"] = rng.randn(D, D)
            sd[b + f"self_attn.{n}_proj.bias"] = rng.randn(D)
        sd[b + "self_attn.out_proj.weight"] = rng.randn(D, D)
        sd[b + "self_attn.out_proj.bias"] = rng.randn(D)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[b + ln + ".weight"] = rng.randn(D)
            sd[b + ln + ".bias"] = rng.randn(D)
        sd[b + "mlp.fc1.weight"] = rng.randn(4 * D, D)
        sd[b + "mlp.fc1.bias"] = rng.randn(4 * D)
        sd[b + "mlp.fc2.weight"] = rng.randn(D, 4 * D)
        sd[b + "mlp.fc2.bias"] = rng.randn(D)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


@pytest.mark.slow  # fast-gate budget: moved after the r3 gate audit
def test_clip_converter_matches_init_and_runs():
    sd = fake_hf_clip(TINY_TEXT)
    conv = hf_clip_text_to_flax(sd, TINY_TEXT)
    model, init_params = init_clip_text(jax.random.key(0), TINY_TEXT)
    a, b = _shapes(init_params), _shapes(conv)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, conv)},
                      jnp.zeros((1, 8), jnp.int32))
    assert out.shape == (1, 8, 16)
    assert np.all(np.isfinite(np.asarray(out)))
