#!/usr/bin/env python
"""Pre-encode an image folder into VAE latent shards for the DiT workload.

The reference re-encodes every batch through the frozen VAE inside the
training loop (DiT/forget.py:265-267); pre-encoding once removes that
per-step forward entirely (the latents are 48x smaller than the images).
Images are decoded lazily and latents are written in fixed-size npz shards
(--shard_size), so corpora that don't fit in RAM (ImageNet-256 scale) stream
through: feed the shard dir to `cli/forget.py --data-path <dir>`.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_folder", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="output npz path (no --shard_size) or shard prefix")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--shard_size", type=int, default=0,
                   help="items per shard; 0 = single npz file")
    p.add_argument("--vae_ckpt", type=str, default="",
                   help="AutoencoderKL params (orbax dir); random if empty")
    p.add_argument("--classes", type=str, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.data.lazy import LazyImageFolder, write_latent_shards
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.models.autoencoder_kl import AutoencoderKL, init_vae

    ds = LazyImageFolder(args.image_folder, args.image_size,
                         class_names=args.classes)
    model, params = init_vae(jax.random.key(0), resolution=args.image_size)
    if args.vae_ckpt:
        params = restore_checkpoint(args.vae_ckpt, params)

    enc = jax.jit(lambda x, k: model.apply(
        {"params": params}, x, k, method=AutoencoderKL.encode))

    def encoded_batches():
        key = jax.random.key(args.seed)
        for i in range(0, len(ds), args.batch_size):
            key, sub = jax.random.split(key)
            x, y = ds.get_batch(np.arange(i, min(i + args.batch_size,
                                                 len(ds))))
            z = np.asarray(enc(jnp.asarray(x * 2.0 - 1.0), sub))
            if (i // args.batch_size) % 20 == 0:
                logging.info("%d / %d", i, len(ds))
            yield z, y

    if args.shard_size > 0:
        paths = write_latent_shards(args.out, encoded_batches(),
                                    args.shard_size)
        print(f"wrote {len(paths)} shards: {paths[0]} ..")
    else:
        zs, ys = zip(*encoded_batches())
        np.savez_compressed(args.out, latents=np.concatenate(zs),
                            labels=np.concatenate(ys))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
