#!/usr/bin/env python
"""DiT Fisher-diagonal CLI — reference-flag-compatible
(DiT/generate_fisher.py:296-316): accumulate squared diffusion-loss
gradients over forget and remain batches and save
<mask-path>/<forget-class>/{forget,remain}_fisher
(DiT/generate_fisher.py:251,291 save layout).
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
    p.add_argument("--n-iters", type=int, default=2000)
    p.add_argument("--batch-size", "--global-batch-size", type=int,
                   default=1, dest="global_batch_size")
    p.add_argument("--seed", "--global-seed", type=int, default=0,
                   dest="global_seed")
    p.add_argument("--vae", type=str, default="ema",
                   help="accepted for reference parity (VAE weights come "
                        "from --vae_ckpt here)")
    p.add_argument("--num-workers", type=int, default=0,
                   help="accepted for reference parity (host pipeline)")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt", type=str, default="",
                   help="pretrained DiT checkpoint (orbax dir or "
                        "reference .pt)")
    p.add_argument("--forget-class", "--label-to-forget", type=int,
                   required=True, dest="label_to_forget")
    p.add_argument("--mask-path", type=str, required=True,
                   help="Fisher artifacts land in <mask-path>/<class>/")
    p.add_argument("--vae_ckpt", type=str, default="",
                   help="VAE params for on-the-fly image-folder encoding")
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    from uurg_tpu.utils.rng import configure_rng

    configure_rng("auto")
    from cli.dit_common import build_workload, forget_remain_iterators
    from uurg_tpu.workloads.dit_runner import dit_generate_fisher

    wl, params = build_workload(args)
    forget_it, remain_it = forget_remain_iterators(args)
    out_dir = os.path.join(args.mask_path, str(args.label_to_forget))
    dit_generate_fisher(wl, params, forget_it, remain_it,
                        n_iters=args.n_iters, out_dir=out_dir,
                        seed=args.global_seed)
    logging.info("fisher artifacts: %s", out_dir)


if __name__ == "__main__":
    main()
