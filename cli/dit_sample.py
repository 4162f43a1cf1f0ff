#!/usr/bin/env python
"""DiT sampling CLI — covers DiT/sample.py (single CFG grid) and
DiT/sample_ddp.py (process-sharded FID sampling -> npz).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="DiT-XL/2")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--mode", type=str, default="grid",
                   choices=["grid", "fid_npz"])
    p.add_argument("--class-labels", type=int, nargs="*",
                   default=[207, 360, 387, 974, 88, 979, 417, 279])
    p.add_argument("--num-fid-samples", type=int, default=50000)
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--num-sampling-steps", type=int, default=250)
    p.add_argument("--per-proc-batch-size", type=int, default=32)
    p.add_argument("--vae-ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-dir", type=str, default="results/dit_samples")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.models.autoencoder_kl import AutoencoderKL, init_vae
    from uurg_tpu.workloads.dit import DiTWorkload
    from uurg_tpu.workloads.dit_runner import dit_sample_fid

    wl = DiTWorkload.build(args.model, args.image_size, args.num_classes)
    params = wl.init_params(jax.random.key(args.seed))
    if args.ckpt:
        if args.ckpt.endswith((".pt", ".pth", ".ckpt")):
            from uurg_tpu.io.dit_interop import load_dit_reference_checkpoint

            params = jax.tree_util.tree_map(
                jnp.asarray,
                load_dit_reference_checkpoint(args.ckpt, wl.cfg))
        else:
            params = restore_checkpoint(args.ckpt, params)

    vae, vae_params = init_vae(jax.random.key(1), resolution=args.image_size)
    if args.vae_ckpt:
        vae_params = restore_checkpoint(args.vae_ckpt, vae_params)
    decode = jax.jit(lambda z: vae.apply(
        {"params": vae_params}, z, method=AutoencoderKL.decode))

    os.makedirs(args.sample_dir, exist_ok=True)
    if args.mode == "grid":
        labels = np.asarray(args.class_labels)
    else:
        labels = np.tile(np.arange(args.num_classes),
                         -(-args.num_fid_samples // args.num_classes)
                         )[: args.num_fid_samples]
    imgs = dit_sample_fid(
        wl, params, labels, respacing=str(args.num_sampling_steps),
        cond_scale=args.cfg_scale, batch_size=args.per_proc_batch_size,
        seed=args.seed, decode_fn=decode)

    if args.mode == "grid":
        from sample import save_grid  # cli/sample.py helper

        save_grid(imgs, os.path.join(args.sample_dir, "sample.png"),
                  ncol=min(8, len(imgs)))
    else:
        np.savez(os.path.join(
            args.sample_dir, f"samples_{jax.process_index()}.npz"),
            arr_0=imgs, labels=labels[jax.process_index()::jax.process_count()])
    print(f"wrote {args.sample_dir}")


if __name__ == "__main__":
    main()
