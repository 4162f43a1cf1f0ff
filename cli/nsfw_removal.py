#!/usr/bin/env python
"""SD NSFW-concept removal CLI — reference-flag-compatible
(SD/train-scripts/nsfw_removal.py): SFR-on two-phase erasure on SD-v1.4.

Data layout (reference parity): --nsfw_data / --not_nsfw_data point to image
folders; prompts default to the nude/clothed pair the reference trains with.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_method", type=str, default="full",
                   choices=["full", "xattn", "selfattn", "noxattn",
                            "notime", "xlayer", "selflayer"])
    p.add_argument("--n_iters", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--forget_alpha", type=float, default=1.0)
    p.add_argument("--remain_alpha", type=float, default=1.0)
    p.add_argument("--ckpt_path", type=str, default="",
                   help="SD UNet params (orbax dir); random init if empty")
    p.add_argument("--mask_path", type=str, default="")
    p.add_argument("--nsfw_data", type=str, default="data/nsfw")
    p.add_argument("--not_nsfw_data", type=str, default="data/not-nsfw")
    p.add_argument("--forget_prompt", type=str, default="a photo of a nude person")
    p.add_argument("--pseudo_prompt", type=str,
                   default="a photo of a person wearing clothes")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str, default="results/sd/nsfw_removal")
    p.add_argument("--snapshot_freq", type=int, default=200)
    p.add_argument("--mesh", type=str, default="",
                   help="multi-chip mesh spec, e.g. 'data=4,model=2'; "
                        "empty = single-chip")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per update "
                        "(effective batch = grad_accum x batch_size at the "
                        "activation memory of one batch)")
    p.add_argument("--parallelism", type=str, default="dp",
                   choices=["dp", "fsdp", "tp", "sp"],
                   help="dp/fsdp/tp: param sharding over the mesh 'model' "
                        "axis; sp: ring-attention sequence parallelism "
                        "over a 'seq' axis (docs/SCALING.md)")
    p.add_argument("--nu_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="Adam second-moment storage dtype (bf16 frees "
                        "~1.7GB at train_method=full)")
    p.add_argument("--pack_mask", action="store_true",
                   help="bit-pack the saliency mask (8x less HBM)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of the run there "
                        "(TensorBoard/Perfetto); empty = off")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uurg_tpu.data import load_image_folder, synthetic_dataset
    from uurg_tpu.io.checkpoint import restore_checkpoint, save_checkpoint
    from uurg_tpu.models.autoencoder_kl import init_vae
    from uurg_tpu.models.clip_text import init_clip_text
    from uurg_tpu.models.sd_unet import init_sd_unet
    from uurg_tpu.workloads.sd import SDWorkload
    from uurg_tpu.workloads.sd_runner import encode_image_folder, nsfw_removal

    wl = SDWorkload.build()
    latent = args.image_size // 8
    _, wl.vae_params = init_vae(jax.random.key(1), wl.vae.cfg,
                                args.image_size)
    _, wl.text_params = init_clip_text(jax.random.key(2), wl.text.cfg)
    _, unet_params = init_sd_unet(jax.random.key(0), wl.unet.cfg, latent)
    if args.ckpt_path:
        unet_params = restore_checkpoint(args.ckpt_path, unet_params)

    def load(path):
        try:
            ds = load_image_folder(path, args.image_size)
            return ds.images_f32() * 2.0 - 1.0
        except FileNotFoundError:
            logging.warning("no images at %s — synthetic", path)
            return (synthetic_dataset(
                32, args.image_size, 3, 2, args.seed).images_f32() * 2 - 1)

    key = jax.random.key(args.seed)
    z_forget, ctx_forget = encode_image_folder(
        wl, load(args.nsfw_data), [args.forget_prompt], key)
    z_remain, ctx_pseudo = encode_image_folder(
        wl, load(args.not_nsfw_data), [args.pseudo_prompt], key)

    def cycle_batches(z, ctxs, seed):
        rng = np.random.default_rng(seed)
        while True:
            idx = rng.integers(0, len(z), args.batch_size)
            yield tuple(jnp.asarray(c) for c in ctxs(z[idx]))

    fb = cycle_batches(
        z_forget,
        lambda zz: (zz, np.repeat(ctx_forget, len(zz), 0),
                    np.repeat(ctx_pseudo, len(zz), 0)),
        args.seed)
    rb = cycle_batches(
        z_remain,
        lambda zz: (zz, np.repeat(ctx_pseudo, len(zz), 0)),
        args.seed + 1)

    mask = None
    if args.mask_path:
        mask = restore_checkpoint(args.mask_path, unet_params)
        mask = jax.tree_util.tree_map(lambda m: jnp.asarray(m, jnp.float32),
                                      mask)

    os.makedirs(args.save_path, exist_ok=True)

    def snapshot(params, step):
        # both formats every snapshot, like the reference's save_model
        # (nsfw_removal.py:217-244): orbax + diffusers-layout npz
        save_checkpoint(os.path.join(args.save_path, f"step_{step}"),
                        params)
        from uurg_tpu.io.diffusers_interop import flax_unet_to_diffusers

        np.savez(os.path.join(args.save_path, f"step_{step}_diffusers.npz"),
                 **flax_unet_to_diffusers(jax.device_get(params),
                                          wl.unet.cfg))

    mesh = None
    if args.mesh:
        from uurg_tpu.parallel import make_mesh, parse_mesh_spec

        mesh = make_mesh(parse_mesh_spec(args.mesh))

    from uurg_tpu.utils.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        final = nsfw_removal(
            wl, unet_params, fb, rb, n_iters=args.n_iters, lr=args.lr,
            train_method=args.train_method, saliency_mask=mask,
            forget_alpha=args.forget_alpha, remain_alpha=args.remain_alpha,
            seed=args.seed, snapshot_hook=snapshot,
            snapshot_freq=args.snapshot_freq,
            mesh=mesh, parallelism=args.parallelism,
            grad_accum=args.grad_accum,
            nu_dtype=jnp.bfloat16 if args.nu_dtype == "bf16" else None,
            pack_mask=args.pack_mask)
    save_checkpoint(os.path.join(args.save_path, "final"), final)
    print(f"done: {args.save_path}")


if __name__ == "__main__":
    main()
