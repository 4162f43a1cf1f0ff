#!/usr/bin/env python
"""SD image-generation eval CLI — reference-flag-compatible
(SD/eval-scripts/generate-images.py): reads a prompt CSV with columns
(case_number, prompt, evaluation_seed), samples via CFG DDIM, writes
{case_number}_{i}.png.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sd_common import setup_workload  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, default="")
    # reference parity flags (SD/eval-scripts/generate-images.py)
    p.add_argument("--model_name", type=str, default="",
                   help="accepted for reference parity; weights come from "
                        "--ckpt_path")
    p.add_argument("--device", type=str, default="",
                   help="accepted for reference parity (device placement "
                        "is JAX-managed)")
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "plms", "lms"],
                   help="lms = the diffusers LMSDiscreteScheduler protocol "
                        "the reference evaluator runs "
                        "(SD/eval-scripts/generate-images.py)")
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--from_case", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd
    from PIL import Image

    from uurg_tpu.models.autoencoder_kl import AutoencoderKL

    wl, unet_params = setup_workload(args)
    latent = args.image_size // 8
    sampler = jax.jit(wl.make_sampler(
        num_steps=args.ddim_steps, guidance_scale=args.guidance_scale,
        latent_size=latent, method=args.sampler))
    decode = jax.jit(lambda z: wl.vae.apply(
        {"params": wl.vae_params}, z, method=AutoencoderKL.decode))

    df = pd.read_csv(args.prompts_path)
    os.makedirs(args.save_path, exist_ok=True)

    def flush(pending):
        case, dev = pending
        imgs = np.clip((np.asarray(dev) + 1) / 2, 0, 1)
        for i in range(args.num_samples):
            Image.fromarray((imgs[i] * 255).astype(np.uint8)).save(
                os.path.join(args.save_path, f"{case}_{i}.png"))
        logging.info("case %d done", case)

    pending = None  # download+PNG-encode case i while the device samples i+1
    for _, row in df.iterrows():
        case = int(row.case_number)
        if case < args.from_case:
            continue
        seed = int(row.get("evaluation_seed", 42))
        ctx = jnp.asarray(np.repeat(
            np.asarray(wl.get_learned_conditioning([str(row.prompt)])),
            args.num_samples, 0))
        z = sampler(unet_params, ctx, jax.random.key(seed))
        dev = decode(z)
        if pending is not None:
            flush(pending)
        pending = (case, dev)
    if pending is not None:
        flush(pending)


if __name__ == "__main__":
    main()
