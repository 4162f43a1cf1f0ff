#!/usr/bin/env python
"""DDPM sampling CLI — reference-flag-compatible (DDPM/sample.py:15-103).

Modes:
  sample_fid      — n_samples per remaining class -> PNG folder for FID
  sample_classes  — grid of samples for every class
  visualization   — one grid image of all classes
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", type=str, default="sample_fid",
                   choices=["sample_fid", "sample_classes", "visualization",
                            "sample_one_class"])
    p.add_argument("--class_label", type=int, default=0,
                   help="class sampled by sample_one_class (the forgotten "
                        "class for classifier UA eval)")
    p.add_argument("--ckpt_folder", type=str, required=True)
    p.add_argument("--label_to_forget", type=int, default=-1,
                   help="class excluded from sample_fid (-1 = none)")
    p.add_argument("--cond_scale", type=float, default=2.0)
    p.add_argument("--n_samples_per_class", type=int, default=500)
    p.add_argument("--classes_to_generate", type=str, default="",
                   help="reference class-list syntax, e.g. '1,2' or 'x0' "
                        "(exclude class 0) — DDPM/sample.py parity")
    p.add_argument("--sample_steps", "--timesteps", type=int, default=50)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "ddpm"])
    p.add_argument("--sample_type", type=str, default="",
                   choices=["", "generalized", "ddpm_noisy"],
                   help="reference name for --sampler (generalized=ddim)")
    p.add_argument("--skip_type", type=str, default="uniform",
                   choices=["uniform", "quad"])
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--sequence", action="store_true",
                   help="accepted for reference parity")
    # EMA params by default (the reference samples the EMA shadow,
    # DDPM/runners/diffusion.py:618-637); --no_ema samples the raw params —
    # needed for short runs where the 0.9999-rate EMA is still ~init
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--out", type=str, default="")
    return p.parse_args()


from uurg_tpu.utils.images import save_grid, save_png_folder  # noqa: E402


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    from uurg_tpu.core.config import load_config
    from uurg_tpu.workloads import ddpm_runner as R
    from uurg_tpu.workloads.ddpm import DDPMWorkload

    config = load_config(args.config)
    wl = DDPMWorkload.from_config(config)
    params = R.load_params(args, config, wl, use_ema=args.use_ema)
    out = args.out or os.path.join(args.ckpt_folder, "samples", args.mode)

    if args.sample_type:
        args.sampler = "ddpm" if args.sample_type == "ddpm_noisy" else "ddim"

    n_classes = config.data.n_classes
    if args.mode == "sample_one_class":
        # forget-class sample folder for the classifier UA/entropy probe
        # (DDPM/runners/diffusion.py:670-823 sample_one_class)
        labels = np.full(args.n_samples_per_class, args.class_label,
                         np.int64)
        imgs = R.sample_images(
            args, config, params, labels, num_steps=args.sample_steps,
            method=args.sampler, cond_scale=args.cond_scale, seed=args.seed)
        save_png_folder(imgs, labels, out)
    elif args.mode == "sample_fid":
        if args.classes_to_generate:
            from uurg_tpu.data.splits import create_class_labels

            classes, _ = create_class_labels(args.classes_to_generate,
                                             n_classes)
        else:
            classes = [c for c in range(n_classes)
                       if c != args.label_to_forget]
        # multi-host: shard classes*samples by process (sample_ddp.py analog)
        import jax
        pid, pcount = jax.process_index(), jax.process_count()
        labels = np.repeat(classes, args.n_samples_per_class)[pid::pcount]
        imgs = R.sample_images(
            args, config, params, labels, num_steps=args.sample_steps,
            method=args.sampler, cond_scale=args.cond_scale, seed=args.seed + pid)
        save_png_folder(imgs, labels, out, start_index=pid * len(labels))
    else:
        per = 10 if args.mode == "visualization" else args.n_samples_per_class
        labels = np.tile(np.arange(n_classes), per)
        imgs = R.sample_images(
            args, config, params, labels, num_steps=args.sample_steps,
            method=args.sampler, cond_scale=args.cond_scale, seed=args.seed)
        os.makedirs(out, exist_ok=True)
        save_grid(imgs, os.path.join(out, "grid.png"), ncol=n_classes)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
