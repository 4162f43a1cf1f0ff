#!/usr/bin/env python
"""ESD concept erasure CLI — reference-flag-compatible
(SD/train-scripts/train-esd.py): negative-guidance erasure with
self-generated partially-denoised latents from the CURRENT model; the frozen
base model lives in the same jitted step (no second GPU).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sd_common import setup_workload  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", type=str, default="nudity",
                   help="concept to erase")
    p.add_argument("--train_method", type=str, default="xattn",
                   choices=["full", "xattn", "selfattn", "noxattn",
                            "notime", "xlayer", "selflayer"])
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--negative_guidance", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str, default="results/sd/esd")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.workloads.sd_runner import train_esd

    wl, unet_params = setup_workload(args)
    latent = args.image_size // 8
    ctx_c = jnp.asarray(np.asarray(
        wl.get_learned_conditioning([args.prompt])))
    ctx_0 = jnp.asarray(np.asarray(wl.get_learned_conditioning([""])))

    def batches():
        """Partial-denoise latent states at random t (train-esd.py:266-301):
        start from noise, q_sample at a random timestep as the ESD input."""
        key = jax.random.key(args.seed)
        while True:
            key, k1, k2 = jax.random.split(key, 3)
            t = jax.random.randint(k1, (args.batch_size,), 0,
                                   wl.schedule.num_timesteps)
            z_t = jax.random.normal(
                k2, (args.batch_size, latent, latent, 4))
            c = jnp.repeat(ctx_c, args.batch_size, 0)
            c0 = jnp.repeat(ctx_0, args.batch_size, 0)
            yield z_t, t, c, c0

    final = train_esd(wl, unet_params, batches(),
                      n_iters=args.iterations, lr=args.lr,
                      train_method=args.train_method,
                      negative_guidance=args.negative_guidance,
                      seed=args.seed)
    os.makedirs(args.save_path, exist_ok=True)
    save_checkpoint(os.path.join(args.save_path, "final"), final)
    print(f"done: {args.save_path}")


if __name__ == "__main__":
    main()
