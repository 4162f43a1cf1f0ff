#!/usr/bin/env python
"""Pre-encode an image folder into VAE latents for the DiT workload.

The reference re-encodes every batch through the frozen VAE inside the
training loop (DiT/forget.py:265-267); pre-encoding once removes that
per-step forward entirely (the latents are 48x smaller than the images) and
is the TPU-friendly way to feed `cli/forget.py --data-path latents.npz`.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--vae_ckpt", type=str, default="",
                   help="AutoencoderKL params (orbax dir); random if empty")
    p.add_argument("--classes", type=str, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.data import load_image_folder
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.models.autoencoder_kl import AutoencoderKL, init_vae

    ds = load_image_folder(args.image_folder, args.image_size,
                           class_names=args.classes)
    model, params = init_vae(jax.random.key(0), resolution=args.image_size)
    if args.vae_ckpt:
        params = restore_checkpoint(args.vae_ckpt, params)

    enc = jax.jit(lambda x, k: model.apply(
        {"params": params}, x, k, method=AutoencoderKL.encode))
    key = jax.random.key(args.seed)
    latents = []
    images = ds.images_f32() * 2.0 - 1.0
    for i in range(0, len(images), args.batch_size):
        key, sub = jax.random.split(key)
        latents.append(np.asarray(enc(jnp.asarray(
            images[i : i + args.batch_size]), sub)))
        if (i // args.batch_size) % 20 == 0:
            logging.info("%d / %d", i, len(images))
    np.savez_compressed(args.out, latents=np.concatenate(latents),
                        labels=ds.labels)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
