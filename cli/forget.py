#!/usr/bin/env python
"""DiT class-forgetting CLI — reference-flag-compatible
(DiT/forget.py:364-397): SFR-on on DiT-XL/2 ImageNet-256 latents.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", type=str, default="")
    p.add_argument("--results-dir", type=str, default="results/dit")
    p.add_argument("--model", type=str, default="DiT-XL/2")
    p.add_argument("--image-size", type=int, default=256,
                   choices=[256, 512])
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--label-to-forget", "--forget-class", type=int,
                   default=0)
    p.add_argument("--ckpt", type=str, default="",
                   help="pretrained DiT checkpoint (orbax dir)")
    p.add_argument("--n-iters", type=int, default=600)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--forget-alpha", type=float, default=1e-3)
    p.add_argument("--remain-alpha", type=float, default=1.0)
    p.add_argument("--unlearn-loss", type=str, default="ga",
                   choices=["ga", "adaga", "rl"])
    p.add_argument("--decay-forget-alpha", action="store_true")
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--method", type=str, default="ron",
                   choices=["ron", "joint"])
    p.add_argument("--snapshot-every", type=int, default=500,
                   help="CFG sample-grid frequency during forgetting")
    p.add_argument("--vae", type=str, default="ema",
                   help="accepted for reference parity (VAE weights come "
                        "from --vae_ckpt here)")
    p.add_argument("--num-workers", type=int, default=0,
                   help="accepted for reference parity (host pipeline)")
    p.add_argument("--mask-path", type=str, default="")
    p.add_argument("--vae_ckpt", type=str, default="",
                   help="VAE params for on-the-fly image-folder encoding")
    p.add_argument("--global-batch-size", "--batch-size", type=int,
                   default=32)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=10000)
    p.add_argument("--mesh", type=str, default="",
                   help="multi-chip mesh spec, e.g. 'data=4,model=2' "
                        "(-1 fills remaining devices); empty = single-chip")
    p.add_argument("--parallelism", type=str, default="dp",
                   choices=["dp", "fsdp", "tp", "pp", "sp"],
                   help="dp/fsdp/tp: param sharding over the mesh 'model' "
                        "axis; pp: GPipe pipeline over a 'stage' axis; "
                        "sp: ring-attention sequence parallelism over a "
                        "'seq' axis (docs/SCALING.md)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="pipeline microbatches (pp only); 0 = stage count")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per update "
                        "(effective batch = grad_accum x batch size at the "
                        "activation memory of one batch)")
    p.add_argument("--remat_policy", type=str, default="full",
                   choices=["full", "attn", "dots", "attn+dots"],
                   help="backward rematerialization policy: full = "
                        "recompute every block (min HBM); attn = save "
                        "attention outputs; dots = save matmul outputs "
                        "(fastest, needs the bf16-moments + --pack_mask "
                        "memory headroom at XL scale)")
    p.add_argument("--mu_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="Adam first-moment storage dtype")
    p.add_argument("--nu_dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="Adam second-moment storage dtype")
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

    from uurg_tpu.utils.rng import configure_rng

    configure_rng("auto")
    from cli.dit_common import build_workload, forget_remain_iterators
    from uurg_tpu.io.checkpoint import restore_checkpoint
    from uurg_tpu.workloads.dit_runner import dit_forget

    wl, params = build_workload(args)

    mask = None
    if args.mask_path:
        mask = restore_checkpoint(args.mask_path, params)
        # bool mask: 1 byte/elem in HBM — float32 would cost ~2.7GB extra
        # carried state at DiT-XL scale and OOM the 16GB chip
        mask = jax.tree_util.tree_map(lambda m: jnp.asarray(m, jnp.bool_),
                                      mask)

    forget_it, remain_it = forget_remain_iterators(args)

    mesh = None
    if args.mesh:
        from uurg_tpu.parallel import make_mesh, parse_mesh_spec

        mesh = make_mesh(parse_mesh_spec(args.mesh))

    ckpt_dir = os.path.join(args.results_dir,
                            f"forget_{args.label_to_forget}")
    os.makedirs(ckpt_dir, exist_ok=True)

    def sample_hook(state, step_idx):
        """CFG latent sample grid every snapshot (DiT/forget.py:344-345
        sample_visualization). Decodes with the VAE only in image-folder
        mode (where real VAE params exist); otherwise saves the latents."""
        from uurg_tpu.workloads.dit_runner import dit_sample_grid

        p = state.ema_params if state.ema_params is not None else state.params
        dit_sample_grid(wl, p,
                        os.path.join(ckpt_dir, f"vis_step{step_idx:06d}.npz"),
                        n_per_class=2,
                        classes=list(range(min(8, args.num_classes))),
                        seed=args.global_seed)

    from uurg_tpu.utils.profiling import maybe_trace

    with maybe_trace(args.profile_dir):
        dit_forget(
            wl, params,
            forget_it,
            remain_it,
            n_iters=args.n_iters, lr=args.lr,
            forget_alpha=args.forget_alpha,
            remain_alpha=args.remain_alpha, unlearn_loss=args.unlearn_loss,
            method=args.method, label_to_forget=args.label_to_forget,
            mask=mask, seed=args.global_seed, log_freq=args.log_every,
            decay_forget_alpha=args.decay_forget_alpha,
            grad_clip=args.grad_clip,
            ckpt_dir=ckpt_dir, ckpt_freq=args.ckpt_every,
            sample_hook=sample_hook, snapshot_freq=args.snapshot_every,
            mesh=mesh,
            parallelism=args.parallelism,
            pp_microbatches=args.pp_microbatches or None,
            grad_accum=args.grad_accum,
            mu_dtype=jnp.bfloat16 if args.mu_dtype == "bf16" else None,
            nu_dtype=jnp.bfloat16 if args.nu_dtype == "bf16" else None,
            pack_mask=args.pack_mask,
        )
    print(f"done: {ckpt_dir}")


if __name__ == "__main__":
    main()
