#!/usr/bin/env python
"""SD random/certain-label erasure CLI — reference-flag-compatible
(SD/train-scripts/random_label.py): pseudo-class MSE forget + remain loss.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sd_common import (  # noqa: E402
    latent_prompt_batches,
    load_images_or_synthetic,
    setup_workload,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--forget_data", type=str, default="data/imagenette/forget")
    p.add_argument("--remain_data", type=str, default="data/imagenette/remain")
    p.add_argument("--forget_prompt", type=str, default="a photo of a tench")
    p.add_argument("--pseudo_prompt", type=str,
                   default="a photo of a golden retriever")
    p.add_argument("--remain_prompt", type=str, default="a photo")
    p.add_argument("--train_method", type=str, default="full")
    p.add_argument("--n_iters", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--remain_alpha", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", type=str, default="results/sd/random_label")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from uurg_tpu.io.checkpoint import save_checkpoint
    from uurg_tpu.workloads.sd_runner import certain_label

    wl, unet_params = setup_workload(args)
    f_imgs = load_images_or_synthetic(args.forget_data, args.image_size,
                                      args.seed)
    r_imgs = load_images_or_synthetic(args.remain_data, args.image_size,
                                      args.seed + 1)
    fb = latent_prompt_batches(wl, f_imgs, args.forget_prompt,
                               args.batch_size, args.seed,
                               extra_prompt=args.pseudo_prompt)
    rb = latent_prompt_batches(wl, r_imgs, args.remain_prompt,
                               args.batch_size, args.seed + 1)
    final = certain_label(wl, unet_params, fb, rb, n_iters=args.n_iters,
                          lr=args.lr, remain_alpha=args.remain_alpha,
                          train_method=args.train_method, seed=args.seed)
    os.makedirs(args.save_path, exist_ok=True)
    save_checkpoint(os.path.join(args.save_path, "final"), final)
    print(f"done: {args.save_path}")


if __name__ == "__main__":
    main()
