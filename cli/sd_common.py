"""Shared setup for the SD train-script CLIs (dataset/model bootstrap —
SD/train-scripts/dataset.py:36-176 parity)."""
from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def setup_workload(args):
    from uurg_tpu.utils.rng import configure_rng

    configure_rng("auto")
    """Build SDWorkload + params (random init or checkpoint)."""
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.models.autoencoder_kl import init_vae
    from uurg_tpu.models.clip_text import init_clip_text
    from uurg_tpu.models.sd_unet import init_sd_unet
    from uurg_tpu.workloads.sd import SDWorkload

    wl = SDWorkload.build()
    latent = args.image_size // 8
    _, wl.vae_params = init_vae(jax.random.key(1), wl.vae.cfg,
                                args.image_size)
    _, wl.text_params = init_clip_text(jax.random.key(2), wl.text.cfg)
    _, unet_params = init_sd_unet(jax.random.key(0), wl.unet.cfg, latent)
    ckpt = getattr(args, "ckpt_path", "")
    if ckpt:
        if ckpt.endswith((".ckpt", ".pt", ".pth")):
            # CompVis sd-v1-* checkpoint (UNet subtree)
            import torch

            from uurg_tpu.io.sd_interop import compvis_unet_to_flax

            sd = torch.load(ckpt, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd)
            unet_params = jax.tree_util.tree_map(
                jnp.asarray, compvis_unet_to_flax(sd, wl.unet.cfg))
        else:
            unet_params = restore_checkpoint(ckpt, unet_params)
    return wl, unet_params


def load_images_or_synthetic(path: str, image_size: int, seed: int = 0):
    from uurg_tpu.data import load_image_folder, synthetic_dataset

    try:
        ds = load_image_folder(path, image_size)
        return ds.images_f32() * 2.0 - 1.0
    except (FileNotFoundError, NotADirectoryError):
        logging.warning("no images at %s — synthetic fallback", path)
        return synthetic_dataset(
            32, image_size, 3, 2, seed).images_f32() * 2 - 1


def latent_prompt_batches(wl, images, prompt: str, batch_size: int,
                          seed: int, extra_prompt: str | None = None):
    """Infinite (z, ctx[, ctx2]) batches with frozen-stage pre-encoding."""
    from uurg_tpu.workloads.sd_runner import encode_image_folder

    key = jax.random.key(seed)
    z, ctx = encode_image_folder(wl, images, [prompt], key)
    ctx2 = (np.asarray(wl.get_learned_conditioning([extra_prompt]))
            if extra_prompt else None)
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, len(z), batch_size)
        zz = jnp.asarray(z[idx])
        c = jnp.asarray(np.repeat(ctx, batch_size, 0))
        if ctx2 is not None:
            yield zz, c, jnp.asarray(np.repeat(ctx2, batch_size, 0))
        else:
            yield zz, c
